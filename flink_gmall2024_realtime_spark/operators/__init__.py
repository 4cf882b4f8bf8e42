"""Operator library — each module maps to a SURVEY.md §2 inventory group.

- ``etl``         P1-P3 parse+filter edges, P4-P6 envelope projection/pruning
- ``joins``       J1-J6 equi/left/interval/lookup/broadcast-config/lateral
- ``windows``     A1-A4 tumbling-window aggregates, W1 watermarking
- ``state``       W2-W4 keyed-state semantics, batch-deterministic forms
- ``split``       R1-R3 multi-way routing and array flattening
- ``dedup``       exact / minhash-LSH / simhash / n-gram-jaccard dedup
- ``similarity``  embedding cosine top-k (brute force + bucketed scale path)
- ``text``        language-ID, quality scoring, token counts, fingerprints
- ``multimodal``  binary media columns: typed metadata + batched decode plumbing
"""
