"""Pure-pandas/NumPy restatement of the reference semantics ("golden
fixtures", SURVEY.md section 5.2.1 / FIXTURES.md section 6).

This is the single source of truth the Spark pipeline is graded
against (triple P/R >= 0.95, BASELINE.json). It mirrors, row for row,
the reference dataflow:

  extract -> normalize (dictionary link) -> span check -> group to sets
  -> doc-keyed join -> per-doc cartesian -> pair group -> score gate

Documented divergences from reference *bugs* (intended semantics kept,
per SURVEY.md section 5.1):

* cellline normalizer char-iteration (``data/pubtator.py:145-151``
  returns str where the caller iterates a list) — we never emit
  one-annotation-per-character.
* ``pubmed2par.tsv`` read/write filename typo
  (``prepare_pair_dataset.py:126`` vs ``:59``) — no filename coupling
  here at all.

Scan strategy is intentionally naive (per-surface str.find loop) so
this module shares NO matching code with the Spark trie operator —
agreement between two independent implementations is the point. The
scoring kernel IS shared (operators/scoring.py:score_vectors) so score
values are bit-identical.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .fixtures import DictEntry, vec_index
from .operators.scoring import score_vectors

_WORD = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_")


def doc_id_of(repo: str, path: str, commit: str) -> str:
    return hashlib.sha256("\x1f".join((repo, path, commit)).encode()).hexdigest()


def expected_mentions(
    corpus_rows: list[tuple[str, str, str, str, str]],
    dictionary: list[DictEntry],
) -> pd.DataFrame:
    surf2links: dict[str, list[tuple[str, str]]] = {}
    for e in dictionary:
        surf2links.setdefault(e.surface.lower(), []).append(
            (e.entity_id, e.entity_type)
        )
    for v in surf2links.values():
        v.sort()
    out = []
    for repo, path, commit, _lang, content in corpus_rows:
        did = doc_id_of(repo, path, commit)
        low = content.lower()
        for surface, links in surf2links.items():
            start = 0
            while True:
                i = low.find(surface, start)
                if i < 0:
                    break
                start = i + 1
                end = i + len(surface)
                if i > 0 and low[i - 1] in _WORD:
                    continue
                if end < len(low) and low[end] in _WORD:
                    continue
                mention = content[i:end]
                # span predicate (data/pubtator.py:74-84)
                if mention.lower() != surface:
                    continue
                for eid, etype in links:
                    out.append((did, eid, etype, mention, i, end))
    return pd.DataFrame(
        out, columns=["doc_id", "entity_id", "entity_type", "mention", "begin", "end"]
    ).drop_duplicates()


def expected_doc2entity(mentions: pd.DataFrame) -> pd.DataFrame:
    g = (
        mentions.groupby("doc_id")["entity_id"]
        .apply(lambda s: sorted(set(s)))
        .reset_index()
    )
    return g.rename(columns={"entity_id": "entity_ids"})


def expected_entity2doc(mentions: pd.DataFrame) -> pd.DataFrame:
    g = (
        mentions.groupby("entity_id")["doc_id"]
        .apply(lambda s: sorted(set(s)))
        .reset_index()
    )
    g = g.rename(columns={"doc_id": "articles"})
    g["n_docs"] = g["articles"].apply(len)
    return g


def expected_pairs(
    mentions: pd.DataFrame, source_type: str, target_type: str
) -> pd.DataFrame:
    """Per-doc cartesian of source-typed x target-typed entity sets
    (prepare_pair_dataset.py:33-37; directed, source first)."""
    src = mentions[mentions.entity_type == source_type]
    tgt = mentions[mentions.entity_type == target_type]
    src_sets = src.groupby("doc_id")["entity_id"].apply(set)
    tgt_sets = tgt.groupby("doc_id")["entity_id"].apply(set)
    out = []
    for did in sorted(set(src_sets.index) & set(tgt_sets.index)):
        for s in sorted(src_sets[did]):
            for t in sorted(tgt_sets[did]):
                if source_type == target_type and s == t:
                    continue
                out.append((did, s, t))
    return pd.DataFrame(out, columns=["doc_id", "subj", "obj"])


def expected_triples(
    pairs: pd.DataFrame,
    pred: str,
    emb_matrix: np.ndarray,
    threshold: float = 0.0,
) -> pd.DataFrame:
    """Pair support aggregation (prepare_pair_dataset.py:42-53) + the
    embedding score gate (README.md:6-11)."""
    if pairs.empty:
        return pd.DataFrame(
            columns=["subj", "pred", "obj", "score", "articles", "n_docs"]
        )
    g = pairs.groupby(["subj", "obj"])["doc_id"].apply(lambda s: sorted(set(s)))
    g = g.reset_index().rename(columns={"doc_id": "articles"})
    g["n_docs"] = g["articles"].apply(len)
    n = emb_matrix.shape[0]
    a_idx = g["subj"].apply(lambda e: vec_index(e, n)).to_numpy(dtype=np.int64)
    b_idx = g["obj"].apply(lambda e: vec_index(e, n)).to_numpy(dtype=np.int64)
    g["score"] = score_vectors(emb_matrix, a_idx, b_idx)
    g["pred"] = pred
    g = g[g["score"] >= threshold]
    return g[["subj", "pred", "obj", "score", "articles", "n_docs"]].reset_index(
        drop=True
    )
