"""Analytics operators beyond the reference's own surface (SURVEY.md §2
groups E/G): dedup, similarity search, text analysis, as-of/range joins,
top-k, multimodal column plumbing.  All DataFrame-native; Python only in
Arrow-batched Pandas UDFs where built-ins genuinely can't express the
semantics."""
