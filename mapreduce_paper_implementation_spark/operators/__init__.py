"""North-star operators: dedup, similarity search, text analysis,
sessionization, multimodal plumbing — the training-data-pipeline layer on
top of the reference-parity relational surface."""
