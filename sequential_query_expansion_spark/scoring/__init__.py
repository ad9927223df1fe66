"""BM25 scoring: the DataFrame scoring-join path (scales with data) and the
block-max WAND/MaxScore kernel over compressed postings (latency path)."""
