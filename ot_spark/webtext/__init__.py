"""Training-data pipeline operators over web-text tables.

Beyond the reference's own operator set: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding near-dup), approximate similarity search,
text analysis (language id, quality scoring, token stats, fingerprinting),
and multimodal column plumbing.  All hot paths are JVM Column algebra or
Arrow-batched UDFs; no per-row Python.
"""
