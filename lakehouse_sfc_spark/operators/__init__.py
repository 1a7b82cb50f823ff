"""Custom operators that need per-batch Python (Arrow / Pandas UDF) rather
than built-in expressions: multimodal decode, and future stateful kernels."""
