"""Scale extensions beyond the reference surface: dedup, similarity
search, text analysis, multimodal plumbing, and relational helpers
(as-of / range joins). All operators are DataFrame-in → DataFrame-out
with no driver-side materialization."""
