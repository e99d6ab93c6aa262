"""Large-scale training-data operations: deduplication, similarity
search, text analysis stages, multimodal column plumbing."""
