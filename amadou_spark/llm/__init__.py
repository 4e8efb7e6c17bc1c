"""LLM-data-pipeline operators (SURVEY §2.2 B08-B10 + north star):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search, text analysis, multimodal column plumbing.

Every operator is a DataFrame→DataFrame function designed for 100 TB:
no driver-side collects, no row-at-a-time Python in hot paths, joins
keyed to avoid cartesian blowups.
"""
