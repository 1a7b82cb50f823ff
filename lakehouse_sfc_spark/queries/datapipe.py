"""Training-data-pipeline operators over documents/embeddings — filled in as
operators land (dedup, similarity search, text analysis, multimodal)."""
