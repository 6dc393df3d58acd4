"""PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the capabilities of
mariosaenger/bio-re-with-entity-embeddings (Saenger & Leser,
Bioinformatics 2020; reference checkout at /root/reference) as an
idiomatic Spark DataFrame / Arrow dataflow over a corpus of source-code
files ``(repo, path, commit, lang, content)``:

* dictionary mention detection + entity linking (broadcast Aho-Corasick
  trie inside ``mapInPandas``) — the analog of the reference's
  PubTator annotation extraction (``data/pubtator.py:324-434``),
* doc<->entity and doc<->pair co-occurrence indexing
  (``data/pubtator.py:384-409``, ``prepare_pair_dataset.py:19-68``),
* embedding-based pair scoring (broadcast NumPy matrix, Arrow batches)
  — the analog of the entity/pair-embedding classifier (``README.md:6-11``),
* threshold triple emission into ``(subj, pred, obj)`` graph tables,
* minhash/connected-components canonicalization for entity dedup.

No code is copied from the reference; file:line citations in docstrings
point at the semantics being reproduced, not at code being reused.
"""

__version__ = "0.1.0"
