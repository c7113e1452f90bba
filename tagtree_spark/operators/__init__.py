"""LLM-data-pipeline operators (E1-E5): dedup, similarity, text, multimodal."""
