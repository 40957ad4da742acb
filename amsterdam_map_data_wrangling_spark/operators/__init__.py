"""Scale-path operators the built-in DataFrame surface doesn't ship:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force cosine, sign-LSH ANN), multimodal binary plumbing."""
