"""Operator library — each module maps to a SURVEY.md §2 inventory group.

- ``etl``         P1-P3 parse+filter edges, P4-P6 envelope projection/pruning
- ``joins``       J1-J6 equi/left/interval/lookup/broadcast-config/lateral
- ``windows``     A1-A4 tumbling-window aggregates, W1 watermarking
- ``state``       W2-W4 keyed-state semantics, batch-deterministic forms
- ``split``       R1-R3 multi-way routing and array flattening
- ``dedup``       exact / minhash-LSH (full + incremental index) / simhash /
                  n-gram-jaccard / containment (brute + rare-shingle index) /
                  duplicated-span removal / connected-component clusters
- ``similarity``  embedding cosine top-k (brute force, sign-bit LSH, IVF with
                  optional k-means training, pre-filtered search, recall eval)
- ``text``        language-ID, quality scoring + logistic gate, token counts,
                  rarity profile, fingerprints/winnowing, tf-idf, chunking,
                  sequence packing, PII scrub, structured extraction
- ``multimodal``  binary media columns: typed metadata + batched decode plumbing
- ``sampling``    deterministic stratified/Bernoulli keeps, hash splits,
                  per-domain caps
- ``merge``       changelog fold + MERGE, SCD2 history/snapshot, partial-agg
                  maintenance
- ``skew``        salted aggregation / salted join for hot keys
"""
