from . import graph, trec  # noqa: F401
