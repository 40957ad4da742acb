"""Scale-path operators the built-in DataFrame surface doesn't ship:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
sorted-neighborhood blocking, edit-distance refine, connected
components), similarity search (brute-force cosine, sign-LSH /
random-hyperplane / IVF ANN, nearest-centroid classification, sparse
TF-IDF cosine, relational Bloom set-sketches), feature prep
(winsorization, robust z-scores, unigram-LM quality scoring,
deterministic uniform/weighted per-group sampling, reproducible
training-order shuffle), skew handling (salted join/agg), range joins,
partition-pruned upsert, small-file compaction, privacy audits
(k-anonymity / l-diversity), and multimodal binary plumbing with real
header-level decodes."""
