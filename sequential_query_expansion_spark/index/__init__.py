"""Inverted-index build: docmap, vocab, doc_len, flat postings (the
scoring-join path) and blocked compressed postings (the WAND path)."""
