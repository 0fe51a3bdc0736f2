"""LLM-training-data pipeline operators — first-class extensions beyond
the reference's surface (see SURVEY.md §2 'LLM-data-pipeline
extensions'): deduplication, similarity search, text analysis, and
multimodal column plumbing, all designed for 100 TB inputs."""
