"""DataFrame operators: the extraction pipeline and the large-scale
training-data-pipeline operator library (dedup, similarity, text stats,
metrics, manifest/resume)."""
