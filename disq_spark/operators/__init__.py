"""Custom operators Spark lacks natively, expressed as DataFrame->DataFrame
transforms so Catalyst optimizes their composition: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
as-of joins, genomic interval joins, multimodal column plumbing.
"""
