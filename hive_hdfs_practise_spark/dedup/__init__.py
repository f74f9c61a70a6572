from .minhash import lsh_bands, minhash_signature_df  # noqa: F401
