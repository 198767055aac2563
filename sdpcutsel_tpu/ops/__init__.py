from .topk import masked_topk  # noqa: F401
