"""LLM-training-data pipeline operators — first-class extensions beyond
the reference's surface (see SURVEY.md §2 'LLM-data-pipeline
extensions'): deduplication, similarity search, text analysis, corpus
hygiene filters, sampling/packing, and multimodal column plumbing, all
designed for 100 TB inputs."""

from dask_geomodeling_spark.pipeline import (decompose, dedup, filter,
                                             multimodal, sample,
                                             similarity, text)

__all__ = ["decompose", "dedup", "filter", "multimodal", "sample",
           "similarity", "text"]
