from .rm3 import rm3_expand_df, rm3_topk  # noqa: F401
