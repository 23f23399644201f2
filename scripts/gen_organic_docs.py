"""Generate an ORGANICALLY-duplicated documents corpus for scale probes.

The replicated 10× probes (scale_probe_r5.py style) plant near-dup
replicas of EVERY document, which grows duplicate-cluster sizes with the
corpus and pair mass ~quadratically — a deliberate worst case.  Real
corpora don't do that: the duplicate RATE is roughly constant as the
corpus grows, so cluster sizes stay O(1) and near-dup pair mass scales
~linearly.  SCALE.md round-12 asserts that; VERDICT r12 #5 asks for the
measurement.  This script builds the corpus that isolates the claim:

- ``n_base`` synthetic documents (seeded numpy; 20-70 words drawn from a
  fixed 4k-word vocabulary with a Zipf-ish rank distribution, 5 langs
  round-robin — the same shape as testdata documents);
- a CONSTANT 15% of base docs spawn organic near-dup variants
  (1 variant 80% / 2 variants 15% / 3 variants 5%), each perturbed the
  way real near-dups differ: one word substituted plus a short suffix —
  similar enough for 3-shingle MinHash and n-gram Jaccard to pair them,
  so the dedup pipelines do real cluster work at every scale.

Scaling ``n_base`` 10× therefore scales docs, duplicate pairs, and
cluster count ~linearly while keeping the cluster-size distribution
fixed — the organic contrast to the planted-replica worst case.

Usage: python scripts/gen_organic_docs.py [n_base] [out_dir]
       (defaults: 5000 /tmp/organic_docs_1x — sf0.1-sized; pass 50000 for
       the 10×-organic corpus)
Writes ``documents.parquet`` with the testdata schema
(doc_id, text, lang, source, n_chars); doc_ids are dense and variants
interleave with bases (variant ids start at n_base*10) so epoch/mod-based
query partitioning sees both classes.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/organic_docs_1x"

LANGS = ["en", "de", "fr", "es", "it"]
SOURCES = ["web", "wiki", "news", "forum"]
DUP_RATE = 0.15
VOCAB_SIZE = 4000


def main() -> None:
    rng = np.random.default_rng(20260816)
    # rank-skewed vocabulary: P(rank r) ~ 1/(r+10).  Word LENGTHS vary
    # 2-12 chars like real text — several downstream fingerprints (the
    # c12 word-derived pixel rows, char-level shingles) key on per-word
    # length/shape, and a constant-length vocab collapses them into one
    # giant everything-matches cluster (first probe attempt: 5.9k docs ->
    # 1 survivor, 85 s of CC over a near-complete graph).
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array(
        [
            "".join(
                letters[rng.integers(0, 26, size=int(rng.integers(2, 13)))]
            )
            for _ in range(VOCAB_SIZE)
        ]
    )
    ranks = np.arange(VOCAB_SIZE)
    probs = 1.0 / (ranks + 10.0)
    probs /= probs.sum()

    doc_ids: list[int] = []
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []

    def add(doc_id: int, words: list[str], lang: str, source: str) -> None:
        doc_ids.append(doc_id)
        texts.append(" ".join(words))
        langs.append(lang)
        sources.append(source)

    variant_id = N_BASE * 10
    for i in range(N_BASE):
        n_words = int(rng.integers(20, 71))
        words = list(vocab[rng.choice(VOCAB_SIZE, size=n_words, p=probs)])
        lang = LANGS[i % len(LANGS)]
        source = SOURCES[int(rng.integers(0, len(SOURCES)))]
        add(i, words, lang, source)
        if rng.random() < DUP_RATE:
            n_var = int(rng.choice([1, 2, 3], p=[0.80, 0.15, 0.05]))
            for v in range(n_var):
                wv = list(words)
                # one substituted word + a short suffix: ~2 shingle
                # neighborhoods move, Jaccard stays far above pairing
                # thresholds — the organic near-dup shape
                pos = int(rng.integers(0, len(wv)))
                wv[pos] = str(vocab[int(rng.integers(0, VOCAB_SIZE))])
                wv.append(f"v{v}")
                add(variant_id, wv, lang, source)
                variant_id += 1

    table = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "documents.parquet")
    # ~32 row groups so local[32] scans parallelize without spread helpers
    pq.write_table(table, path, row_group_size=max(256, len(doc_ids) // 32))
    n_var_total = len(doc_ids) - N_BASE
    print(
        f"{len(doc_ids)} docs ({N_BASE} base + {n_var_total} organic "
        f"variants) -> {path}"
    )


if __name__ == "__main__":
    main()
