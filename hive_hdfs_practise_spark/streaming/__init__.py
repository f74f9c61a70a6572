from . import heartbeat, windows  # noqa: F401
