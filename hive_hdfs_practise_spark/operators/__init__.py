from . import pagination, relational, write  # noqa: F401
