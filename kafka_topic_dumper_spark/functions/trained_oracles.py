"""Literal-injected DuckDB oracles for queries whose plan consumes
DRIVER-TRAINED state (k-means codebooks, learned BPE merges).

The r6 verdict's point: "rows-only" was too weak for these five rows —
the trained state is computed driver-side from a deterministic,
metadata-sized derivation, so an independent replay can recompute it
OUTSIDE Spark and inject the values as literals into the same oracle
SQL shape that already hash-checks the untrained twins. What stays
under differential test is exactly the DISTRIBUTED part of each query
(assignment map stage, per-cell joins, encode/score folds, corpus
aggregation) — the part that runs on 100 TB.

Independence discipline: nothing here imports Spark or the operator
modules' kernels. The corpus is read through DuckDB (the oracle
engine), the training loops are re-stated in numpy/pure Python, and
the resulting literals round-trip exactly (17-significant-digit
scientific notation for doubles — shortest-repr-safe either way).

Replayed derivations and their Spark-side twins:

- spherical Lloyd's IVF codebook ← ``similarity.ivf_codebook_trained``
  (deterministic md5-ordered ≤4096 sample, init = first k rows, 20
  iterations, empty-cell carry-over);
- per-subspace plain-L2 Lloyd's PQ codebook ←
  ``similarity.pq_codebook_trained`` (same sample, independent
  subspaces);
- BPE merge learning ← ``bpe._learn`` (pair argmax with
  (count DESC, UTF-8(left), UTF-8(right)) tie-break, leftmost
  non-overlapping merge fold).

Both sides run float64 numpy on the identical sample matrix in the
same process environment, so the trained literals are bit-identical to
what the Spark query's driver-side training produces — any divergence
in the distributed stages then fails the hash compare just like the
untrained rows.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache


def _dlit(x: float) -> str:
    """A DuckDB DOUBLE literal that parses back to exactly ``x``.

    17 significant digits uniquely identify a float64; the exponent
    forces DOUBLE (a bare ``0.1`` literal parses as DECIMAL in
    DuckDB, which would re-round on the later cast)."""
    return f"{float(x):.16e}"


def _slit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@lru_cache(maxsize=8)
def _sample_matrix(sf_dir: str):
    """The deterministic hash-bounded training sample, read through
    DuckDB: non-null embeddings ordered by (md5(vec_id::VARCHAR),
    vec_id), capped at 4096 — byte-identical selection to the Spark
    side's ``orderBy(F.md5(vec_id.cast("string")), vec_id).limit``
    (md5 hex is lowercase in both engines; float→double widening is
    exact in both)."""
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"""
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM '{sf_dir}/embeddings.parquet'
        WHERE embedding IS NOT NULL
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 4096
        """
    ).fetchall()
    return np.asarray([r[0] for r in rows], dtype=np.float64)


@lru_cache(maxsize=8)
def ivf_trained_codebook(sf_dir: str, n_centroids: int = 16, iters: int = 20):
    """Spherical Lloyd's replay of ``similarity.ivf_codebook_trained``
    — identical numpy op sequence on the identical sample, so the
    centroids (and their norms) are bit-equal to the Spark query's
    driver-side codebook. Returns (centroid ndarray, norm ndarray)."""
    import numpy as np

    X = _sample_matrix(sf_dir)
    nrm0 = np.linalg.norm(X, axis=1, keepdims=True)
    Xn = X / np.where(nrm0 == 0, 1.0, nrm0)
    C = Xn[:n_centroids].copy()
    for _ in range(iters):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for c in range(n_centroids):
            members = Xn[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C, np.linalg.norm(C, axis=1)


def ivf_trained_centroid_cte(sf_dir: str, n_centroids: int = 16) -> str:
    """The ``c(cid, c, c_nrm)`` CTE body with the trained centroids as
    literals — drop-in replacement for the untrained oracles'
    ``SELECT vec_id AS cid, v AS c, nrm AS c_nrm FROM n WHERE ...``."""
    C, norms = ivf_trained_codebook(sf_dir, n_centroids)
    rows = ",\n                ".join(
        f"(CAST({cid} AS BIGINT), [{', '.join(_dlit(x) for x in C[cid])}],"
        f" {_dlit(norms[cid])})"
        for cid in range(n_centroids)
    )
    return f"SELECT * FROM (VALUES {rows}) AS _c(cid, c, c_nrm)"


@lru_cache(maxsize=8)
def pq_trained_codebook(
    sf_dir: str, m: int = 16, ksub: int = 16, iters: int = 20
):
    """Per-subspace plain-L2 Lloyd's replay of
    ``similarity.pq_codebook_trained`` — same sample, same init, same
    iteration count, independent subspaces. Returns ndarray
    (m, ksub, dsub)."""
    import numpy as np

    X = _sample_matrix(sf_dir)
    dsub = X.shape[1] // m
    cb = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:ksub].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        cb[j] = C
    return cb


def pq_trained_centroid_cte(sf_dir: str, m: int = 16, ksub: int = 16) -> str:
    """The ``cent(cid, j, cv)`` CTE body with the trained per-subspace
    centroids as literals — replaces the untrained
    ``SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < 16``."""
    cb = pq_trained_codebook(sf_dir, m, ksub)
    rows = ",\n                ".join(
        f"(CAST({cid} AS BIGINT), CAST({j} AS BIGINT),"
        f" [{', '.join(_dlit(x) for x in cb[j][cid])}])"
        for j in range(m)
        for cid in range(ksub)
    )
    return f"SELECT * FROM (VALUES {rows}) AS _cent(cid, j, cv)"


@lru_cache(maxsize=8)
def _bpe_word_freqs(sf_dir: str) -> tuple[tuple[str, int], ...]:
    """(word, freq) over the BPE word derivation, read through DuckDB
    with the same split/lower/length rule the Spark side uses (the
    equivalence of the two derivations is itself oracle-gated by
    ``text_bpe_pair_counts``)."""
    import duckdb

    rows = duckdb.sql(
        rf"""
        SELECT word, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
            FROM '{sf_dir}/documents.parquet'
        ) WHERE length(word) >= 2
        GROUP BY word
        """
    ).fetchall()
    return tuple((w, int(f)) for w, f in rows)


def _apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Leftmost non-overlapping merge — the pure form of the Spark
    side's JVM ``aggregate`` fold (``bpe._merge_expr``)."""
    out: list[str] = []
    j = 0
    while j < len(syms):
        if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
            out.append(left + right)
            j += 2
        else:
            out.append(syms[j])
            j += 1
    return out


@lru_cache(maxsize=8)
def bpe_trained_state(sf_dir: str, n_merges: int = 8):
    """Pure-Python BPE learning replay: returns (merges, seg) where
    ``merges`` is [(step, left, right, pair_count)] and ``seg`` maps
    word → final symbol list. Tie-break matches the Spark learner:
    (count DESC, UTF-8 bytes of left ASC, UTF-8 bytes of right ASC)."""
    freqs = dict(_bpe_word_freqs(sf_dir))
    seg = {w: list(w) for w in freqs}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, syms in seg.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0].encode(), kv[0][1].encode()),
        )
        merges.append((step, left, right, cnt))
        for w in seg:
            seg[w] = _apply_merge(seg[w], left, right)
    return tuple(merges), {w: tuple(s) for w, s in seg.items()}


def bpe_merges_oracle_sql(sf_dir: str, n_merges: int = 8) -> str:
    """Expected merge table as literals — the differential then checks
    the distributed learner end-to-end (corpus word shuffle, per-step
    vocabulary aggregation, argmax tie-break, fold application)."""
    merges, _ = bpe_trained_state(sf_dir, n_merges)
    rows = ",\n               ".join(
        f"(CAST({step} AS INTEGER), {_slit(l)}, {_slit(r)},"
        f" CAST({cnt} AS BIGINT))"
        for step, l, r, cnt in merges
    )
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _m(step, "left", "right", pair_count)
        ORDER BY step
        """


def bpe_encode_oracle_sql(sf_dir: str, n_merges: int = 8) -> str:
    """Encode oracle: per-word piece counts from the replayed final
    segmentation join the corpus word stream IN DUCKDB, so the whole
    distributed encode path (word stream, vocabulary join, per-doc
    aggregation, compression ratio) is hash-checked — only the
    vocabulary-sized segmentation lengths are injected."""
    _, seg = bpe_trained_state(sf_dir, n_merges)
    rows = ",\n               ".join(
        f"({_slit(w)}, CAST({len(syms)} AS BIGINT))"
        for w, syms in sorted(seg.items())
    )
    return rf"""
        WITH seg AS (
            SELECT * FROM (VALUES {rows}) AS _s(word, n_pieces_w)
        ), stream AS (
            SELECT doc_id, word FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '\s+')) AS word
                FROM documents
            ) WHERE length(word) >= 2
        )
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(g.n_pieces_w) AS BIGINT) AS n_pieces,
               round(CAST(sum(g.n_pieces_w) AS DOUBLE) / count(*), 4)
                   AS pieces_per_word
        FROM stream s JOIN seg g USING (word)
        GROUP BY s.doc_id
        """


# --- baseline-JPEG decode replay (round 8) --------------------------------
#
# The JPEG registry row (operators/multimodal.py synth→encode→decode)
# is lossy, so no closed-form SQL reconstructs the decoded pixels —
# but for a FIXED integer decoder the output is deterministic. The
# replay below re-states the mathematical pipeline INDEPENDENTLY:
# raster synth → edge-pad → fixed-point fDCT → Annex-K quantization →
# dequantization → fixed-point IDCT → clamp/crop/sum. It deliberately
# does NOT re-implement the entropy coding: Huffman+zigzag are
# lossless, so the quantized coefficients are the whole information
# content of the stream. Consequently the differential check asserts
# (a) every integer-DCT/quantization step bit-for-bit and (b) that the
# kernel's entropy encode→decode round trip is in fact lossless — a
# non-symmetric Huffman bug changes decoded coefficients and fails the
# hash; a symmetric one is pinned separately by the handcrafted-stream
# unit test in tests/test_training_ops.py.
#
# Spec constants (the DCT basis and quant table) are shared verbatim —
# they are published JPEG/Annex-K numbers, not code.

_JPEG_M_ROWS = (
    (2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896),
    (4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
    (3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784),
    (3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
    (2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896),
    (2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
    (1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567),
    (799, -2276, 3406, -4017, 4017, -3406, 2276, -799),
)

_JPEG_Q_ROWS = (
    (16, 11, 10, 16, 24, 40, 51, 61),
    (12, 12, 14, 19, 26, 58, 60, 55),
    (14, 13, 16, 24, 40, 57, 69, 56),
    (14, 17, 22, 29, 51, 87, 80, 62),
    (18, 22, 37, 56, 68, 109, 103, 77),
    (24, 35, 55, 64, 81, 104, 113, 92),
    (49, 64, 78, 87, 103, 121, 120, 101),
    (72, 92, 95, 98, 112, 100, 103, 99),
)


@lru_cache(maxsize=8)
def _jpeg_expected_rows(sf_dir: str) -> tuple:
    """(doc_id, width, height, n_pixels, pixel_sum) per document —
    the decoded-pixel expectation for the fixed integer codec."""
    import duckdb
    import numpy as np

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    M = np.array(_JPEG_M_ROWS, dtype=np.int64)
    Q = np.array(_JPEG_Q_ROWS, dtype=np.int64)
    HALF = 1 << 25
    out = []
    for d in ids:
        d = int(d)
        w, h = 8 + d % 9, 8 + d % 7
        p = ((d + np.arange(w * h, dtype=np.int64)) % 256).reshape(h, w)
        H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
        img = np.pad(p, ((0, H8 - h), (0, W8 - w)), mode="edge")
        blocks = (
            img.reshape(H8 // 8, 8, W8 // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
            - 128
        )
        F = (np.matmul(np.matmul(M, blocks), M.T) + HALF) >> 26
        q = np.where(
            F >= 0, (F * 2 + Q) // (2 * Q), -(((-F) * 2 + Q) // (2 * Q))
        )
        deq = q * Q
        P = (np.matmul(np.matmul(M.T, deq), M) + HALF) >> 26
        rec = np.clip(P + 128, 0, 255)
        rec = (
            rec.reshape(H8 // 8, W8 // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(H8, W8)[:h, :w]
        )
        out.append((d, w, h, w * h, int(rec.sum())))
    return tuple(out)


def jpeg_decode_oracle_sql(sf_dir: str) -> str:
    rows = ",\n               ".join(
        f"(CAST({d} AS BIGINT), CAST({w} AS INTEGER), CAST({h} AS INTEGER),"
        f" CAST({n} AS BIGINT), CAST({s} AS BIGINT))"
        for d, w, h, n, s in _jpeg_expected_rows(sf_dir)
    )
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _j(doc_id, width, height, n_pixels, pixel_sum)
        """


# --- Motion-JPEG decode replay (round 9) -----------------------------------
#
# The MJPEG registry row (operators/multimodal.py synth_mjpeg_video →
# decode_mjpeg_frames) is the AVI-container composition of the JPEG
# pipeline: k = doc_id % 3 + 1 frames per document, frame raster
# p[i] = (doc_id + 11·f + i) % 256, and a 33333 µs frame clock. The
# replay below reuses the SAME independent integer-DCT replay per
# frame (see the JPEG note above for why entropy coding is excluded:
# it is lossless, so the quantized coefficients are the whole
# information content — the differential therefore also proves the
# kernel's container walk + per-frame Huffman round trip lossless and
# the header-derived ms timestamps exact).


def _mjpeg_frame_sum(d: int, f: int) -> tuple:
    """(width, height, pixel_sum) for one decoded MJPEG frame — the
    fixed-integer-codec expectation, replayed independently."""
    import numpy as np

    M = np.array(_JPEG_M_ROWS, dtype=np.int64)
    Q = np.array(_JPEG_Q_ROWS, dtype=np.int64)
    HALF = 1 << 25
    w, h = 8 + d % 9, 8 + d % 7
    p = ((d + 11 * f + np.arange(w * h, dtype=np.int64)) % 256).reshape(h, w)
    H8, W8 = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.pad(p, ((0, H8 - h), (0, W8 - w)), mode="edge")
    blocks = (
        img.reshape(H8 // 8, 8, W8 // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128
    )
    F = (np.matmul(np.matmul(M, blocks), M.T) + HALF) >> 26
    q = np.where(F >= 0, (F * 2 + Q) // (2 * Q), -(((-F) * 2 + Q) // (2 * Q)))
    P = (np.matmul(np.matmul(M.T, q * Q), M) + HALF) >> 26
    rec = np.clip(P + 128, 0, 255)
    rec = (
        rec.reshape(H8 // 8, W8 // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(H8, W8)[:h, :w]
    )
    return w, h, int(rec.sum())


@lru_cache(maxsize=8)
def _mjpeg_expected_rows(sf_dir: str) -> tuple:
    """(doc_id, frame_idx, frame_offset_ms, width, height, pixel_sum)
    per decoded frame, replayed independently of the kernel."""
    import duckdb

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    out = []
    for d in ids:
        d = int(d)
        for f in range(d % 3 + 1):
            w, h, s = _mjpeg_frame_sum(d, f)
            out.append((d, f, f * 33333 // 1000, w, h, s))
    return tuple(out)


def mjpeg_decode_oracle_sql(sf_dir: str) -> str:
    rows = ",\n               ".join(
        f"(CAST({d} AS BIGINT), CAST({f} AS INTEGER), CAST({ms} AS BIGINT),"
        f" CAST({w} AS INTEGER), CAST({h} AS INTEGER), CAST({s} AS BIGINT))"
        for d, f, ms, w, h, s in _mjpeg_expected_rows(sf_dir)
    )
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _m(doc_id, frame_idx, frame_offset_ms, width, height, pixel_sum)
        """


# --- PCA projection replay (round 9) ---------------------------------------
#
# The PCA registry row (operators/similarity.py::pca_project) is
# deterministic end-to-end: floor-quantized integer embeddings, an
# EXACT int64 Gram/sum reduction (addition commutes — partitioning
# can't perturb it), a fixed-count power iteration on the driver, and
# an exact int64 projection dot with the mean term folded into one
# float constant per component. The replay below restates that
# pipeline independently of any engine import; every float op
# downstream of the integer Gram is the same correctly-rounded
# sequence, so the literals match bit-for-bit.

_PCA_REPLAY_QUANT = 1_000_000
_PCA_REPLAY_COMP_SCALE = 1 << 31
_PCA_REPLAY_ITERS = 60


@lru_cache(maxsize=8)
def _pca_expected_rows(sf_dir: str) -> tuple:
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = [int(r[0]) for r in rows]
    X = np.floor(
        np.array([r[1] for r in rows], dtype=np.float64) * _PCA_REPLAY_QUANT
    ).astype(np.int64)
    n, d = X.shape
    G = X.T @ X
    S = X.sum(axis=0)
    C = (G.astype(np.float64) - np.outer(S, S) / n) / n
    comps = []
    work = C.copy()
    for _ in range(2):
        v = np.ones(d, dtype=np.float64) / np.sqrt(d)
        for _ in range(_PCA_REPLAY_ITERS):
            w = work @ v
            v = w / np.sqrt(w @ w)
        lam = float(v @ work @ v)
        comps.append(v)
        work = work - lam * np.outer(v, v)
    V = np.stack(comps)
    vq = np.floor(V * _PCA_REPLAY_COMP_SCALE).astype(np.int64)
    mean = S.astype(np.float64) / n
    mdot = (mean @ vq.T) / _PCA_REPLAY_COMP_SCALE
    D = X @ vq.T
    P = (D.astype(np.float64) / _PCA_REPLAY_COMP_SCALE - mdot) / _PCA_REPLAY_QUANT
    return tuple(
        (i, float(P[r, 0]), float(P[r, 1])) for r, i in enumerate(ids)
    )


def pca_project_oracle_sql(sf_dir: str) -> str:
    rows = ",\n               ".join(
        f"(CAST({i} AS BIGINT), CAST({_dlit(p1)} AS DOUBLE),"
        f" CAST({_dlit(p2)} AS DOUBLE))"
        for i, p1, p2 in _pca_expected_rows(sf_dir)
    )
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _p(vec_id, pc1, pc2)
        """


# --- DCT perceptual-hash replay (round 9) -----------------------------------
#
# The real-pHash registry rows (operators/multimodal.py::phash_dct /
# phash_dct_neardup) hash the deterministic RAW rasters through the
# shared fixed-point DCT; the replay below re-states that integer
# pipeline independently (same published DCT constants as the JPEG
# replay above). The near-dup oracle then applies the DEFINITIONAL
# hamming rule (xor_popcount ≤ T over all pairs) to the replayed
# hashes — so the Spark side's banded-pigeonhole join is proven
# complete, not just self-consistent.


@lru_cache(maxsize=8)
def _phash_expected_rows(sf_dir: str) -> tuple:
    import duckdb
    import numpy as np

    ids = [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    M = np.array(_JPEG_M_ROWS, dtype=np.int64)
    out = []
    for d in ids:
        w, h, c = 8 + d % 9, 8 + d % 7, 3
        px = ((d + np.arange(w * h * c, dtype=np.int64)) % 256).reshape(
            h, w, c
        )
        lum = px.sum(axis=2) // c
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        small = lum[np.ix_(ys, xs)] - 128
        coef = (M @ small @ M.T + (1 << 25)) >> 26
        ac = coef.reshape(64)[1:]
        med = int(np.sort(ac)[31])
        bits = ac > med
        phash = 0
        for k in range(63):
            if bits[k]:
                phash |= 1 << k
        out.append((d, phash, int(bits.sum())))
    return tuple(out)


def phash_dct_oracle_sql(sf_dir: str) -> str:
    rows = ",\n               ".join(
        f"(CAST({d} AS BIGINT), CAST({p} AS BIGINT), CAST({n} AS INTEGER))"
        for d, p, n in _phash_expected_rows(sf_dir)
    )
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _h(doc_id, phash, n_ones)
        """


def phash_neardup_oracle_sql(sf_dir: str, max_hamming: int = 6) -> str:
    rows = ",\n               ".join(
        f"(CAST({d} AS BIGINT), CAST({p} AS BIGINT))"
        for d, p, _ in _phash_expected_rows(sf_dir)
    )
    return f"""
        WITH h AS (
            SELECT * FROM (VALUES {rows}) AS _h(doc_id, phash)
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
        """


# --- WAV spectral replay (round 9) ------------------------------------------
#
# The spectral-audio row (operators/multimodal.py::wav_spectral) runs
# the first 64 synthesized PCM samples through the shared fixed-point
# DCT; the replay below re-states that integer pipeline from the
# synthesis formula (sample[i] = (doc_id·31 + i·17) mod 65536 − 32768)
# independently of any engine import.


@lru_cache(maxsize=8)
def _wav_spectral_expected_rows(sf_dir: str) -> tuple:
    import duckdb
    import numpy as np

    ids = [
        int(r[0])
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    M = np.array(_JPEG_M_ROWS, dtype=np.int64)
    out = []
    for d in ids:
        i = np.arange(64, dtype=np.int64)
        s = (d * 31 + i * 17) % 65536 - 32768
        C = (M @ s.reshape(8, 8) @ M.T + (1 << 25)) >> 26
        bands = np.abs(C).sum(axis=1)
        out.append((d, int(C[0, 0]), *(int(x) for x in bands)))
    return tuple(out)


def wav_spectral_oracle_sql(sf_dir: str) -> str:
    rows = ",\n               ".join(
        "(" + ", ".join(f"CAST({v} AS BIGINT)" for v in row) + ")"
        for row in _wav_spectral_expected_rows(sf_dir)
    )
    cols = ", ".join(f"band{u}" for u in range(8))
    return f"""
        SELECT * FROM (VALUES {rows})
        AS _w(doc_id, dc, {cols})
        """
