"""Large-scale training-data corpus operations over the documents /
embeddings tables: text statistics, deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search (brute-force
and LSH-bucketed ANN), and multimodal column plumbing.

These generalize the reference's per-page text pipeline to corpus scale:
the same "tokenize -> score -> classify -> keep/strip" shape
(/root/reference/A003_colored_footer.py:177-244) applied to whole documents
instead of page blocks. All hot paths are JVM-side built-in expressions
(no Python UDFs); every operator is a declarative DataFrame plan so
Catalyst handles pushdown/pruning and AQE handles shuffle sizing.
"""
