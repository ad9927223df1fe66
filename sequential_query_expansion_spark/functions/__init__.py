"""Scalar / vectorized functions: tokenizer contract, text analysis,
similarity primitives. Built-in ``pyspark.sql.functions`` wherever possible
(JVM-side, whole-stage codegen); pandas UDFs only for genuinely
non-expressible kernels (stemming, minhash, codec)."""
