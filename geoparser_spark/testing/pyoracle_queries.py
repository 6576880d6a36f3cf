"""Pure-Python oracle builders for the queries whose primitives DuckDB
lacks (Spark xxhash64, deterministic k-means, the sha256 stub
featurizer).  Each builder reads the parquet tables straight from the
scale-factor dir (pyoracle.oracle_sf_dir), recomputes the expected
result with an independent implementation, and returns a SQL VALUES
statement the harness runs like any other oracle.

These are replicas of the QUERY ENTRY semantics in __spark_entry__ —
any drift between an entry's parameters and the replica here shows up
as a red correctness row, which is the point.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal, localcontext

import numpy as np

from geoparser_spark.testing.pyoracle import (
    distinct_keep_order,
    read_table,
    shingles,
    spark_round,
    spark_xxhash64,
    tokens,
    values_sql,
)

_M64 = (1 << 64) - 1

# ------------------------------------------------------------- dedup family

PLANT_SUFFIX = " planted near duplicate suffix"
PLANT_ID_OFFSET = 1_000_000


_PLANTED_CACHE: dict = {}
_PAIR_CACHE: dict = {}


def _docs_with_planted(modulus: int) -> list[tuple[int, str]]:
    from geoparser_spark.testing.pyoracle import oracle_sf_dir

    key = (oracle_sf_dir(), modulus)
    if key not in _PLANTED_CACHE:
        rows = read_table("documents", "doc_id, text",
                          f"doc_id % {modulus} = 0")
        base = [(int(i), t) for i, t in rows]
        _PLANTED_CACHE[key] = base + [
            (i + PLANT_ID_OFFSET, t + PLANT_SUFFIX) for i, t in base]
    return _PLANTED_CACHE[key]


def _minhash_pairs(docs: list[tuple[int, str]], n: int, num_hashes: int,
                   bands: int, threshold: float,
                   modulus: int | None = None) -> list[tuple[int, int, float]]:
    """Shared replica of dedup.minhash_lsh_pairs — shingling, per-seed
    min xxhash64, banded bucket join, exact Jaccard verify.  Memoized:
    three oracles (minhash_lsh, cluster, recall) drive the identical
    parameters, and the x32 per-shingle signature pass dominates
    oracle-build time.

    Memo key is (sf_dir, modulus, doc count, params) — the same
    identity family _PLANTED_CACHE uses, NOT id(docs): CPython recycles
    object ids, so an id-keyed memo could serve stale pairs if a caller
    ever passed a transient list; the explicit modulus keeps two
    coincidentally-equal-length corpora from sharing a cache entry."""
    from geoparser_spark.testing.pyoracle import oracle_sf_dir

    ck = (oracle_sf_dir(), modulus, len(docs), n, num_hashes, bands,
          threshold)
    if ck in _PAIR_CACHE:
        return _PAIR_CACHE[ck]
    rows_per_band = num_hashes // bands
    sigs: dict[int, tuple[set, list[int]]] = {}
    for i, t in docs:
        sh = shingles(tokens(t), n)
        if not sh:
            continue
        sig = [min(spark_xxhash64(s, k) for s in sh) for k in range(num_hashes)]
        sigs[i] = (set(sh), sig)
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, (_, sig) in sigs.items():
        for b in range(bands):
            bh = spark_xxhash64(*sig[b * rows_per_band:(b + 1) * rows_per_band])
            buckets[(b, bh)].append(i)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for a in ids:
            for c in ids:
                if a < c:
                    cands.add((a, c))
    out = []
    for a, c in sorted(cands):
        sa, _ = sigs[a]
        sc, _ = sigs[c]
        j = len(sa & sc) / len(sa | sc)
        if j >= threshold:
            out.append((a, c, spark_round(j, 6)))
    _PAIR_CACHE[ck] = out
    return out


def minhash_lsh_pairs_sql(modulus: int = 5, n: int = 3, num_hashes: int = 32,
                          bands: int = 16, threshold: float = 0.5) -> str:
    """Expected output of dedup.minhash_lsh_pairs over the planted
    corpus (see _minhash_pairs)."""
    docs = _docs_with_planted(modulus)
    out = _minhash_pairs(docs, n, num_hashes, bands, threshold,
                         modulus=modulus)
    return values_sql(out, ["id_a", "id_b", "jaccard"])


def minhash_cluster_sql(modulus: int = 5, n: int = 3, num_hashes: int = 32,
                        bands: int = 16, threshold: float = 0.5) -> str:
    """Expected output of the full dedup chain: LSH pairs -> connected
    components (union-find here; alternating stars on Spark) -> every
    doc of the planted corpus labeled with its component min (isolated
    docs label themselves)."""
    docs = _docs_with_planted(modulus)
    pairs = _minhash_pairs(docs, n, num_hashes, bands, threshold,
                           modulus=modulus)
    parent = {int(i): int(i) for i, _ in docs}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = sorted((i, find(i)) for i in parent)
    return values_sql(out, ["doc_id", "component"])


def line_dedup_cms_sql(max_repeats: int = 2, depth: int = 4,
                       width: int = 8192) -> str:
    """Expected output of dedup.line_dedup_cms over documents: full
    replica — Java-\\s sentence split, distinct (doc, key) pairs,
    count-min sketch with spark_xxhash64(key, d) buckets, min-over-depth
    estimate, keep rule, in-order rebuild."""
    import re

    rows = read_table("documents", "doc_id, text")
    parsed: dict[int, list[tuple[int, str, str]]] = {}
    pairs: set[tuple[int, str]] = set()
    for i, t in rows:
        i = int(i)
        # Java regex \\s is ASCII-only — [ \\t\\n\\x0b\\f\\r]
        marked = re.sub(r"([.!?])[ \t\n\x0b\f\r]+", "\\1\x1f", t)
        keyed = [(pos, line, line.strip(" ").lower())
                 for pos, line in enumerate(marked.split("\x1f"))]
        parsed[i] = keyed
        for _, _, key in keyed:
            if key:
                pairs.add((i, key))
    sketch: dict[tuple[int, int], int] = defaultdict(int)
    for _, key in pairs:
        for d in range(depth):
            sketch[(d, spark_xxhash64(key, d) % width)] += 1

    def est(key: str) -> int:
        return min(sketch.get((d, spark_xxhash64(key, d) % width), 0)
                   for d in range(depth))

    out = []
    for i, keyed in sorted(parsed.items()):
        kept = [line for _, line, key in keyed
                if key and est(key) <= max_repeats]
        out.append((i, " ".join(kept), len(kept), len(keyed) - len(kept)))
    return values_sql(out, ["doc_id", "clean_text", "n_kept", "n_dropped"])


def _simhash_fp(text: str) -> str:
    toks = distinct_keep_order(tokens(text))
    hs = [spark_xxhash64(t) & _M64 for t in toks]
    m = len(hs)
    return "".join(
        "1" if 2 * sum((h >> j) & 1 for h in hs) > m else "0"
        for j in range(64)
    )


def simhash_sql(modulus: int = 10) -> str:
    rows = read_table("documents", "doc_id, text", f"doc_id % {modulus} = 0")
    out = [(int(i), _simhash_fp(t)) for i, t in rows]
    return values_sql(out, ["id", "simhash"])


def simhash_pairs_sql(modulus: int = 5, max_hamming: int = 16) -> str:
    rows = read_table("documents", "doc_id, text", f"doc_id % {modulus} = 0")
    fps = {int(i): _simhash_fp(t) for i, t in rows}
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for i, fp in fps.items():
        for b in range(4):
            buckets[(b, fp[b * 16:(b + 1) * 16])].append(i)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for a in ids:
            for c in ids:
                if a < c:
                    cands.add((a, c))
    out = []
    for a, c in sorted(cands):
        ham = sum(x != y for x, y in zip(fps[a], fps[c]))
        if ham <= max_hamming:
            out.append((a, c, ham))
    return values_sql(out, ["id_a", "id_b", "hamming"])


# --------------------------------------------------------- media features

def _jpeg_idct_replica(grid: list, bh: int, bw: int,
                       h: int, w: int) -> list:
    """Pure-Python integer-IDCT replay for the JPEG fixture: basis
    A[u][x] = round(2^13 * c(u)/2 * cos((2x+1)uπ/16)) recomputed here
    with math.cos (the decoder builds the same 64 integers — landing
    them independently IS the check), dequant by FLAT_Q (all ones),
    s = A^T F A at scale 2^26, one round-half-up arithmetic shift,
    +128 level shift, clamp, crop to (h, w).  Every step is exact
    int arithmetic, so this replica is bit-identical to
    jpeg_codec.idct2d_int without sharing a line of numpy."""
    A = [[round((1 << 13) * ((1.0 / math.sqrt(2.0)) if u == 0 else 1.0)
                / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0))
          for x in range(8)] for u in range(8)]
    half, shift = 1 << 25, 26
    img = [[0] * (8 * bw) for _ in range(8 * bh)]
    for by in range(bh):
        for bx in range(bw):
            F = grid[by][bx]
            for x in range(8):
                for y in range(8):
                    s = 0
                    for u in range(8):
                        t = 0
                        for v in range(8):
                            t += F[u][v] * A[v][y]
                        s += A[u][x] * t
                    p = ((s + half) >> shift) + 128
                    img[by * 8 + x][bx * 8 + y] = min(255, max(0, p))
    return [img[y][x] for y in range(h) for x in range(w)]


def _pattern_feats(chans: list[list[int]], w: int, h: int,
                   dim: int) -> list[float]:
    """png_codec.pixel_features mirrored over pattern-space channel
    lists (dims, per-channel mean/variance, channel-0 histogram) —
    the ONE stats replica shared by every pattern oracle (media
    features, gif frames), each statistic an integer aggregate + one
    IEEE division exactly as the engine computes it."""
    n = w * h
    feats = [w / 4096.0, h / 4096.0]
    for band in chans:
        sb = sum(band)
        qb = sum(p * p for p in band)
        feats.append(sb / (n * 255.0))
        feats.append((qb * n - sb * sb) / (n * n * 65025.0))
    bins = dim - len(feats)
    counts = [0] * bins
    for p in chans[0]:
        counts[(p * bins) // 256] += 1
    feats.extend(c / n for c in counts)
    return feats


def _emit_feats(feats: list[float], dim: int) -> tuple:
    """float32-cast + spark_round of the checked elements (f0, f2,
    f10, f_last), exactly as the Arrow FloatType column holds them."""
    return (
        spark_round(float(np.float32(feats[0])), 6),
        spark_round(float(np.float32(feats[2])), 6),
        spark_round(float(np.float32(feats[10])), 6),
        spark_round(float(np.float32(feats[dim - 1])), 6),
    )


def media_features_sql(modulus: int = 10, dim: int = 16) -> str:
    """Replica of the media-features query's THREE paths:

    * doc_id % 30 == 0 → PNG / TIFF / BMP-RLE8 / BMP-16bit /
      TIFF-tiled / TIFF-G4-fax rotating by i//30 mod 6: REAL pixel
      statistics recomputed from the greyscale gradient PATTERN
      ((i*7 + y*w + x) % 256) with pure-Python integer loops (the
      16-bit masked leg replays the 5-5-5 quantize+upscale integer
      rule; the fax leg the >=128 bilevel threshold to 0/255) — the
      Spark side goes pattern →
      encoder → Arrow kernel → decoder → features, so this replica
      catches any codec defect without sharing a line of it.
    * doc_id % 30 == 10 → GIF: same discipline over the 16-color
      palette pattern (idx = (i*5 + y*w + x) % 16, palette channel c
      = idx·{37,59,83} mod 256) — the Spark side round-trips a real
      LZW stream; the replica never runs LZW at all.
    * doc_id % 30 == 20 → JPEG (alternating BASELINE and PROGRESSIVE
      encodings by k = i//30 parity): the fixture lives in COEFFICIENT
      space and both entropy layers are lossless, so decoded pixels
      are exactly intIDCT(pattern) either way — replayed by
      _jpeg_idct_replica's pure-Python integer loops; the Spark side
      runs the real Huffman decode (sequential or Annex G multi-scan)
      + fixed-point IDCT in jpeg_codec.
      Every statistic is an integer aggregate + one IEEE division,
      mirrored expression-for-expression from png_codec.pixel_features.

    All emitted elements go through float32 before rounding, exactly
    as the Arrow FloatType column does."""
    rows = read_table("documents", "doc_id", f"doc_id % {modulus} = 0")
    out = []
    for (i,) in rows:
        i = int(i)
        if i % 30 == 0:
            w, h = i % 9 + 4, i % 5 + 3
            n = w * h
            # greyscale: all three channel slots read channel 0
            band = [(i * 7 + y * w + x) % 256
                    for y in range(h) for x in range(w)]
            if (i // 30) % 8 == 3:
                # BMP 16-bit 5-5-5 leg: encode quantizes each channel
                # by (v*31 + 127)//255 and decode upscales by
                # (q*255 + 15)//31 — replay the exact integer rule
                band = [(((p * 31 + 127) // 255) * 255 + 15) // 31
                        for p in band]
            elif (i // 30) % 8 == 5:
                # CCITT G4 leg: the pattern thresholds to bilevel
                # (>=128 -> black, stored bit 1 under photometric 0)
                # and decodes to 0/255 luminance
                band = [0 if p >= 128 else 255 for p in band]
            # legs 0/1/2/4, 6 (OS/2 core BMP) and 7 (16-bit tiled
            # TIFF, pattern << 8 so the kept MSB IS the pattern) are
            # lossless: the pattern passes through unchanged
            chans = [band] * 3
        elif i % 30 == 10:
            w, h = i % 7 + 3, i % 4 + 2
            n = w * h
            idxs = [(i * 5 + y * w + x) % 16
                    for y in range(h) for x in range(w)]
            muls = (37, 59, 83)
            chans = [[(k * m) % 256 for k in idxs] for m in muls]
        else:
            k = i // 30
            bw, bh = k % 3 + 1, k % 2 + 1
            w, h = 8 * bw - k % 5, 8 * bh - k % 3
            n = w * h
            grid = [[[[(i * 7 + by * 11 + bx * 13 + u * 8 + v * 3) % 9 - 4
                       if (u, v) != (0, 0)
                       else (i + by * 3 + bx) % 17 - 8
                       for v in range(8)] for u in range(8)]
                     for bx in range(bw)] for by in range(bh)]
            chans = [_jpeg_idct_replica(grid, bh, bw, h, w)] * 3
        feats = _pattern_feats(chans, w, h, dim)
        out.append((f"img://{i}", True) + _emit_feats(feats, dim))
    return values_sql(out, ["media_ref", "decode_ok", "f0", "f2", "f10",
                            "f15"])


# ------------------------------------------------------------------- ANN

def _fold_dot(a: list[float], b: list[float]) -> float:
    """aggregate(zip_with(a, b, x*y), 0.0, acc+x) — sequential fold,
    bit-identical to the Spark expression."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _fold_norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def ivf_topk_sql(query: list[float], n_lists: int = 8, sample: int = 512,
                 k: int = 10, nprobe: int = 2) -> str:
    """Replica of similarity.ivf_fit_centroids + ivf_topk: id-hash
    sample order, deterministic k-means fit (same Lloyd as the tile
    pyramid), first-min list assignment, nprobe probe, cosine rerank."""
    from geoparser_spark.operators.tiles import kmeans_fit

    rows = read_table("embeddings", "vec_id, embedding")
    vecs = [(int(i), [float(x) for x in v]) for i, v in rows]
    sampled = sorted(vecs, key=lambda r: (spark_xxhash64(r[0]), r[0]))[:sample]
    pts = np.array([v for _, v in sampled], dtype=np.float64)
    cents = kmeans_fit(pts, n_lists)
    q = np.asarray(query, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = {int(i) for i in np.argsort(d, kind="stable")[:nprobe]}
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    cent_lists = [[float(x) for x in c] for c in cents]
    hits = []
    for i, v in vecs:
        # mirror aggregate's sequential fold per centroid
        dists = []
        for c in cent_lists:
            acc = 0.0
            for a, b in zip(v, c):
                acc = acc + (a - b) * (a - b)
            dists.append(acc)
        lst = dists.index(min(dists))
        if lst in probe:
            cos = _fold_dot(v, query) / (_fold_norm(v) * qn)
            hits.append((i, cos))
    hits.sort(key=lambda r: (-r[1], r[0]))
    out = [(i, spark_round(c, 6)) for i, c in hits[:k]]
    return values_sql(out, ["vec_id", "cosine"])


def lsh_topk_sql(query: list[float], k: int = 10, n_planes: int = 4,
                 seed: int = 42) -> str:
    """SQL oracle for similarity.lsh_topk: the hyperplanes are
    deterministic literals, so the bucket filter and cosine rerank are
    plain DuckDB expressions over the embeddings table."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, len(query)))
    qbits = ["1" if float(np.dot(p, query)) >= 0 else "0" for p in planes]
    qlist = "[" + ", ".join(repr(float(x)) for x in query) + "]"
    conds = []
    for p, bit in zip(planes, qbits):
        plist = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        op = ">=" if bit == "1" else "<"
        conds.append(f"list_dot_product(v, {plist}) {op} 0")
    qn = float(np.sqrt(np.dot(query, query))) or 1.0
    return f"""
        WITH b AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), hit AS (
          SELECT vec_id,
                 list_dot_product(v, {qlist})
                   / (sqrt(list_dot_product(v, v)) * {qn!r}) AS cos_raw
          FROM b
          WHERE {" AND ".join(conds)}
        )
        SELECT vec_id, round(cos_raw, 6) AS cosine
        FROM hit ORDER BY cos_raw DESC, vec_id ASC LIMIT {k}"""


def lsh_near_dup_pairs_sql(threshold: float = 0.99, n_planes: int = 8,
                           n_tables: int = 2, seed: int = 42) -> str:
    """Expected output of similarity.lsh_near_dup_pairs over the full
    embeddings table plus planted duplicates (every %5 vector copied
    under vec_id + PLANT_ID_OFFSET): per-table sign buckets with the same sequential
    fold-left dot product Spark's aggregate() uses (sign flips near
    zero make summation order part of the contract), OR-ed candidate
    pairs, exact cosine verify."""
    rows = read_table("embeddings", "vec_id, embedding", order="vec_id")
    vecs = {int(i): [float(x) for x in v] for i, v in rows}
    vecs.update({i + PLANT_ID_OFFSET: v for i, v in list(vecs.items())
                 if i % 5 == 0})
    if not vecs:
        return values_sql([], ["id_a", "id_b", "cosine"])
    dim = len(next(iter(vecs.values())))
    cands: set[tuple[int, int]] = set()
    for t in range(n_tables):
        planes = np.random.RandomState(seed + t).normal(size=(n_planes, dim))
        buckets: dict[str, list[int]] = defaultdict(list)
        for i, v in vecs.items():
            key = "".join(
                "1" if _fold_dot([float(x) for x in p], v) >= 0 else "0"
                for p in planes
            )
            buckets[key].append(i)
        for ids in buckets.values():
            for a in ids:
                for b in ids:
                    if a < b:
                        cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        va, vb = vecs[a], vecs[b]
        c = _fold_dot(va, vb) / (_fold_norm(va) * _fold_norm(vb))
        if c >= threshold:
            out.append((a, b, spark_round(c, 6)))
    return values_sql(out, ["id_a", "id_b", "cosine"])


# ------------------------------------------------------------------ tiles

def _pmod_d(x: float, m: float) -> float:
    r = math.fmod(x, m)
    return r + m if r < 0 else r


def _dec_avg(vals: list[float]) -> float:
    """Replica of avg(cast(x as decimal(24,16))) cast back to double:
    quantize each value at 16 dp HALF_UP (BigDecimal.valueOf semantics
    — shortest decimal repr), exact sum, divide at scale 20 HALF_UP."""
    with localcontext() as ctx:
        ctx.prec = 60
        q16 = Decimal(1).scaleb(-16)
        s = sum(
            (Decimal(repr(v)).quantize(q16, rounding=ROUND_HALF_UP) for v in vals),
            Decimal(0),
        )
        avg = (s / len(vals)).quantize(Decimal(1).scaleb(-20), rounding=ROUND_HALF_UP)
        return float(avg)


def _event_points() -> list[tuple[float, float]]:
    rows = read_table("events", "event_id, value", "event_id % 20 = 0")
    pts = {}
    for _, value in rows:
        lat = _pmod_d(value * 37, 180.0) - 90
        lon = _pmod_d(value * 91, 360.0) - 180
        pts[(lat, lon)] = True
    return list(pts)


def tile_pyramid_replica(k: int = 8, leaf_max: int = 10, max_levels: int = 3):
    """Replica of operators.tiles.build_tile_pyramid over the event-
    derived point set: deterministic sample order, same Lloyd k-means,
    first-min assignment, decimal centroid averages.  Returns
    (tiles_rows, extents_rows) with unrounded doubles."""
    from geoparser_spark.operators.tiles import kmeans_fit

    points = _event_points()
    state = [("0", lat, lon) for lat, lon in points]
    tiles: list[tuple] = []
    extents: list[tuple] = []
    for level in range(max_levels):
        groups: dict[str, list[tuple[float, float]]] = defaultdict(list)
        for p, lat, lon in state:
            groups[p].append((lat, lon))
        leaf_paths = {p for p, mem in groups.items() if len(mem) <= leaf_max}
        for p in leaf_paths:
            for lat, lon in groups[p]:
                tiles.append((level, p, lat, lon, 1, True))
        active = {p: mem for p, mem in groups.items() if p not in leaf_paths}
        if not active:
            break
        nxt: list[tuple[str, float, float]] = []
        if level == 0:
            allpts = [pt for mem in active.values() for pt in mem]
            keyed = sorted(
                allpts,
                key=lambda pt: (
                    spark_xxhash64(pt[0], pt[1]) % 100003, pt[0], pt[1]
                ),
            )
            sample = np.array(keyed[:k * 200], dtype=np.float64)
            cents = kmeans_fit(sample, k)
            cent_pairs = [(float(c[0]), float(c[1])) for c in cents]
            for lat, lon in active["0"]:
                dists = [
                    (lat - la) * (lat - la) + (lon - lo) * (lon - lo)
                    for la, lo in cent_pairs
                ]
                c = dists.index(min(dists))
                nxt.append((f"0/{c}", lat, lon))
        else:
            for p, mem in active.items():
                mem_sorted = sorted(mem)
                pts = np.array(mem_sorted, dtype=np.float64)
                cents = kmeans_fit(pts, k)
                d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d.argmin(axis=1)
                nxt.extend(
                    (f"{p}/{a}", lat, lon)
                    for (lat, lon), a in zip(mem_sorted, assign)
                )
        child: dict[str, list[tuple[float, float]]] = defaultdict(list)
        for p, lat, lon in nxt:
            child[p].append((lat, lon))
        for p, mem in child.items():
            lats = [lat for lat, _ in mem]
            lons = [lon for _, lon in mem]
            tiles.append(
                (level + 1, p, _dec_avg(lats), _dec_avg(lons), len(mem), False)
            )
            extents.append(
                (level + 1, p, min(lats), max(lats), min(lons), max(lons))
            )
        state = nxt
    return tiles, extents


def tile_extents_sql(k: int = 8, leaf_max: int = 10, max_levels: int = 3) -> str:
    _, extents = tile_pyramid_replica(k, leaf_max, max_levels)
    out = [
        (lvl, p, spark_round(a, 6), spark_round(b, 6),
         spark_round(c, 6), spark_round(d, 6))
        for lvl, p, a, b, c, d in extents
    ]
    return values_sql(
        out, ["level", "cluster_path", "min_lat", "max_lat", "min_lon", "max_lon"]
    )


def viewport_tiles_sql(min_lat: float, max_lat: float,
                       min_lon: float, max_lon: float,
                       k: int = 8, leaf_max: int = 10,
                       max_levels: int = 3) -> str:
    tiles, extents = tile_pyramid_replica(k, leaf_max, max_levels)
    hit = {
        (lvl, p)
        for lvl, p, mn_la, mx_la, mn_lo, mx_lo in extents
        if mn_la <= max_lat and mx_la >= min_lat
        and mn_lo <= max_lon and mx_lo >= min_lon
    }
    out = [
        (lvl, p, spark_round(lat, 6), spark_round(lon, 6), label)
        for lvl, p, lat, lon, label, _leaf in tiles
        if (lvl, p) in hit
    ]
    return values_sql(
        out, ["level", "cluster_path", "latitude", "longitude", "label"]
    )


# ---------------------------------------------------------- sampling family


def hash_sample_sql(num: int = 1, den: int = 10) -> str:
    """Expected output of sampling.hash_sample(documents): rows whose
    pmod(xxhash64(doc_id), den) < num, with the bucket exposed."""
    rows = read_table("documents", "doc_id, n_chars")
    out = []
    for i, n_chars in rows:
        b = spark_xxhash64(int(i)) % den  # python % is pmod for den > 0
        if b < num:
            out.append((int(i), int(n_chars), int(b)))
    return values_sql(sorted(out), ["doc_id", "n_chars", "bucket"])


def _chunk_docs(max_tokens: int, overlap: int) -> list[tuple[int, int, int]]:
    """Replica of chunking.chunk_documents over documents:
    (doc_id, chunk_idx, n_tokens) per window."""
    step = max_tokens - overlap
    out = []
    for i, text in read_table("documents", "doc_id, text"):
        toks = tokens(text or "")
        if not toks or "".join(toks) == "":
            continue
        n = len(toks)
        last = max(0, -(-(n - max_tokens) // step))  # ceil, clamped
        starts = [j * step for j in range(last + 1)]
        for idx, s in enumerate(starts):
            out.append((int(i), idx, min(n - s, max_tokens)))
    return out


def chunk_windows_sql(max_tokens: int = 64, overlap: int = 16) -> str:
    """Expected (doc_id, chunk_idx, n_tokens) of chunk_documents."""
    return values_sql(sorted(_chunk_docs(max_tokens, overlap)),
                      ["doc_id", "chunk_idx", "n_tokens"])


def pack_sequences_sql(chunk_max: int = 64, overlap: int = 16,
                       max_tokens: int = 200, n_buckets: int = 8) -> str:
    """Expected per-(bucket, seq_id) rollup of pack_sequences over the
    chunked documents: deterministic (xxhash64(id, idx), id, idx)
    order, exclusive running sum, floor-div sequence cut."""
    chunks = _chunk_docs(chunk_max, overlap)
    per_bucket: dict[int, list[tuple]] = {}
    for i, idx, nt in chunks:
        b = spark_xxhash64(i) % n_buckets
        per_bucket.setdefault(b, []).append(
            (spark_xxhash64(i, idx), i, idx, nt))
    agg: dict[tuple[int, int], list[int]] = {}
    for b, lst in per_bucket.items():
        cum = 0
        for _, _, _, nt in sorted(lst):
            seq = cum // max_tokens
            a = agg.setdefault((b, seq), [0, 0])
            a[0] += 1
            a[1] += nt
            cum += nt
    out = [(b, s, c, t) for (b, s), (c, t) in agg.items()]
    return values_sql(sorted(out), ["bucket", "seq_id", "n_chunks", "total_tokens"])


def cap_per_group_sql(k: int = 5) -> str:
    """Expected output of sampling.cap_per_group(documents, [source],
    k): per source, the k docs with the smallest (xxhash64(doc_id),
    doc_id) rank — aggregated per source (count + exact char total +
    min kept hash) so the check covers the selection."""
    rows = read_table("documents", "doc_id, source, n_chars")
    by_src: dict[str, list[tuple[int, int, int]]] = {}
    for i, src, n_chars in rows:
        h = spark_xxhash64(int(i))
        by_src.setdefault(src, []).append((h, int(i), int(n_chars)))
    out = []
    for src, lst in by_src.items():
        kept = sorted(lst)[:k]
        out.append((src, len(kept), sum(c for _, _, c in kept),
                    min(h for h, _, _ in kept)))
    return values_sql(sorted(out),
                      ["source", "n_kept", "total_chars", "min_hash"])


def hash_split_sql(weights=(8, 1, 1), labels=("train", "val", "test")) -> str:
    """Expected output of sampling.hash_split(documents) aggregated per
    split: counts and exact total characters."""
    rows = read_table("documents", "doc_id, n_chars")
    den = sum(weights)
    bounds = []
    acc = 0
    for w, lab in zip(weights, labels):
        acc += w
        bounds.append((acc, lab))
    agg: dict[str, list[int]] = {lab: [0, 0] for lab in labels}
    for i, n_chars in rows:
        b = spark_xxhash64(int(i)) % den
        lab = next(l for bnd, l in bounds if b < bnd)
        agg[lab][0] += 1
        agg[lab][1] += int(n_chars)
    out = [(lab, c, t) for lab, (c, t) in agg.items() if c]
    return values_sql(sorted(out), ["split", "n_docs", "total_chars"])


# ------------------------------------------------------ semdedup / bpe (r3)

def semdedup_sql(n_lists: int = 8, sample: int = 512,
                 threshold: float = 0.3) -> str:
    """Replica of similarity.semdedup_prune: id-hash sample -> same
    deterministic k-means -> first-min exact-fold assignment -> within-
    cluster pairwise exact-fold cosine -> prune any vector with a
    lower-id neighbor at cosine >= threshold."""
    from geoparser_spark.operators.tiles import kmeans_fit

    rows = read_table("embeddings", "vec_id, embedding")
    vecs = [(int(i), [float(x) for x in v]) for i, v in rows]
    sampled = sorted(vecs, key=lambda r: (spark_xxhash64(r[0]), r[0]))[:sample]
    cents = kmeans_fit(
        np.array([v for _, v in sampled], dtype=np.float64), n_lists)
    cent_lists = [[float(x) for x in c] for c in cents]

    def assign(v: list[float]) -> int:
        dists = []
        for c in cent_lists:
            acc = 0.0
            for a, b in zip(v, c):
                acc = acc + (a - b) * (a - b)
            dists.append(acc)
        return dists.index(min(dists))

    clusters: dict[int, list[tuple[int, list[float]]]] = defaultdict(list)
    assign_of: dict[int, int] = {}
    for i, v in vecs:
        lst = assign(v)
        assign_of[i] = lst
        clusters[lst].append((i, v))
    pruned: set[int] = set()
    for lst, members in clusters.items():
        members.sort()
        norms = {i: _fold_norm(v) for i, v in members}
        for ai in range(len(members)):
            ia, va = members[ai]
            for bi in range(ai + 1, len(members)):
                ib, vb = members[bi]
                if ib in pruned:
                    continue
                cos = _fold_dot(va, vb) / (norms[ia] * norms[ib])
                if cos >= threshold:
                    pruned.add(ib)
    out = [(i, assign_of[i], 1 if i in pruned else 0) for i, _ in vecs]
    return values_sql(out, ["vec_id", "ivf_list", "pruned"])


def bpe_encode_sql(n_merges: int = 60, sample: int = 200,
                   modulus: int = 10) -> str:
    """Independent BPE replica for operators.bpe: learn merges on the
    same bounded sample spec (max-freq, lexicographically-smallest tie
    break), then greedy leftmost-lowest-rank encode of every doc."""
    sample_rows = read_table(
        "documents", "text", f"doc_id % {modulus} = 0", "doc_id")[:sample]
    freq: dict[str, int] = defaultdict(int)
    for (t,) in sample_rows:
        for w in tokens(t):
            if w:
                freq[w] += 1
    split = {w: list(w) + ["</w>"] for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = defaultdict(int)
        for w, f in freq.items():
            s = split[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best_pair, best_f = None, -1
        for p, f in pc.items():
            if f > best_f or (f == best_f and p < best_pair):
                best_pair, best_f = p, f
        merges.append(best_pair)
        a, b = best_pair
        for w, s in split.items():
            j, ns = 0, []
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    ns.append(a + b)
                    j += 2
                else:
                    ns.append(s[j])
                    j += 1
            split[w] = ns
    rank = {p: i for i, p in enumerate(merges)}

    cache: dict[str, list[str]] = {}

    def enc(w: str) -> list[str]:
        if w in cache:
            return cache[w]
        s = list(w) + ["</w>"]
        while len(s) > 1:
            best, bi = None, -1
            for i in range(len(s) - 1):
                r = rank.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            s[bi:bi + 2] = [s[bi] + s[bi + 1]]
        cache[w] = s
        return s

    out = []
    for i, t in read_table("documents", "doc_id, text"):
        ws = [w for w in tokens(t) if w]
        total = sum(len(enc(w)) for w in ws)
        first = "|".join(enc(ws[0])) if ws else ""
        out.append((int(i), len(ws), total, first))
    return values_sql(
        out, ["doc_id", "n_words", "n_bpe_tokens", "first_pieces"])


def weighted_sample_sql(rates_bp: dict[str, int], default_bp: int = 10_000,
                        den: int = 10_000) -> str:
    """Expected output of sampling.weighted_sample(documents): rows
    whose pmod(xxhash64(doc_id), den) < rate_bp(source)."""
    rows = read_table("documents", "doc_id, source, lang")
    out = []
    for i, src, lang in rows:
        rate = rates_bp.get(src, default_bp)
        if spark_xxhash64(int(i)) % den < rate:
            out.append((int(i), src, lang))
    return values_sql(sorted(out), ["doc_id", "source", "lang"])


# ------------------------------------------------------------ BM25 ranking

def bm25_topk_sql(terms: list[str], k: int = 10, k1: float = 1.2,
                  b: float = 0.75) -> str:
    """Replica of serve.bm25_topk: same Lucene idf form, same IEEE
    float operation ORDER (the engine computes idf/avgdl driver-side
    in this very arithmetic, so a value match checks the Spark-side
    tf/dl extraction and scoring expression)."""
    rows = read_table("documents", "doc_id, text", order="doc_id")
    toks = {int(i): tokens(t) for i, t in rows}
    n = len(rows)
    if n == 0:
        return values_sql([], ["doc_id", "score"])
    dl = {i: len(tk) for i, tk in toks.items()}
    tf = {i: [tk.count(w) for w in terms] for i, tk in toks.items()}
    avgdl = sum(dl.values()) / n
    df = [sum(1 for i in toks if tf[i][j] > 0) for j in range(len(terms))]
    idf = [math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for d in df]
    k1p1, one_m_b = k1 + 1.0, 1.0 - b

    def term_score(i: int, j: int) -> float:
        t, d = float(tf[i][j]), float(dl[i])
        return (idf[j] * (t * k1p1)
                / (t + k1 * (one_m_b + b * (d / avgdl))))

    out = []
    for i in toks:
        if not any(tf[i][j] > 0 for j in range(len(terms))):
            continue
        score = term_score(i, 0)
        for j in range(1, len(terms)):
            score = score + term_score(i, j)
        out.append((i, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return values_sql(out[:k], ["doc_id", "score"])


# ----------------------------------------------------- compression signal

def compression_signal_sql(level: int = 6) -> str:
    """Replica of text_quality.compression_signal — same stdlib zlib
    (fixed public algorithm), same single IEEE division."""
    import zlib

    rows = read_table("documents", "doc_id, text", order="doc_id")
    out = []
    for i, t in rows:
        b = (t or "").encode("utf-8")
        nb, nc = len(b), len(zlib.compress(b, level))
        out.append((int(i), nb, nc, nc / max(nb, 1)))
    return values_sql(
        out, ["doc_id", "n_bytes", "n_compressed", "compression_ratio"])


# --------------------------------------------------------------- PageRank

def pagerank_topk_sql(n_hosts: int, iterations: int, k: int) -> str:
    """Exact replica of the integer PageRank query: same edge
    synthesis arithmetic, same scaled-integer update — integer sums
    are order-independent, so this is bit-for-bit the engine's
    answer by construction, not by float luck."""
    from geoparser_spark.operators.pagerank import (
        DAMP_DEN, DAMP_NUM, SCALE, TELEPORT_DEN, TELEPORT_NUM)

    rows = read_table("documents", "doc_id")
    edges = set()
    for (i,) in rows:
        i = int(i)
        s = i % n_hosts
        for d in ((i * 7 + 3) % n_hosts, (i * 13 + 5) % n_hosts):
            if d != s:
                edges.add((s, d))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    teleport = (TELEPORT_NUM * SCALE) // TELEPORT_DEN
    rank = {v: SCALE for v in nodes}
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += (rank[s] * DAMP_NUM) // (DAMP_DEN * outdeg[s])
        rank = {v: teleport + inflow[v] for v in nodes}
    named = [(f"host{v}.example.com", r) for v, r in rank.items()]
    # tie-break on the STRING hostname (the engine's sort key), not
    # the numeric suffix — "host10..." < "host2..." lexicographically
    named.sort(key=lambda kv: (-kv[1], kv[0]))
    return values_sql(named[:k], ["host", "rank"])


# --------------------------------------------------- substring windows

def substring_windows_sql(n: int = 5, modulus: int = 5,
                          offset: int = 1_000_001) -> str:
    """Replica of the dedup_substring query: same plant construction
    (raw single-space split, second token half), same chained
    xxhash64 window fingerprints, same corpus-frequency counting
    (within-doc repeats count), same single IEEE division.  The plant
    offset is deliberately NOT divisible by the modulus so plant ids
    can never collide with kept base ids at any SF."""
    rows = read_table("documents", "doc_id, text",
                      f"doc_id % {modulus} = 0", order="doc_id")
    corpus = [(int(i), t) for i, t in rows]
    corpus += [
        (i + offset,
         " ".join(t.split(" ")[len(t.split(" ")) // 2:]))
        for i, t in corpus
    ]
    windows = {}
    freq = defaultdict(int)
    for i, t in corpus:
        toks = tokens(t)
        ws = [spark_xxhash64(*toks[j:j + n])
              for j in range(len(toks) - n + 1)] if len(toks) >= n else []
        windows[i] = ws
        for h in ws:
            freq[h] += 1
    out = []
    for i, ws in sorted(windows.items()):
        nd = sum(1 for h in ws if freq[h] > 1)
        out.append((i, len(ws), nd, nd / max(len(ws), 1)))
    return values_sql(
        out, ["doc_id", "n_windows", "n_dup_windows", "dup_fraction"])


# ------------------------------------------------------ unicode normalize

def unicode_normalize_sql(dirt: str, modulus: int = 3,
                          form: str = "NFKC") -> str:
    """Replica of text_quality.unicode_normalize over the seeded
    corpus — same unicodedata tables, same Cc/Cf scrub and whitespace
    collapse."""
    import unicodedata

    def clean(t: str) -> str:
        norm = unicodedata.normalize(form, t)
        kept = "".join(
            ch for ch in norm
            if ch in "\n\t" or unicodedata.category(ch) not in ("Cc", "Cf")
        )
        return " ".join(kept.split())

    rows = read_table("documents", "doc_id, text", order="doc_id")
    out = []
    for i, t in rows:
        i = int(i)
        raw = t + dirt if i % modulus == 0 else t
        c = clean(raw)
        out.append((i, c, len(raw), len(c), raw != c))
    return values_sql(
        out,
        ["doc_id", "clean_text", "n_chars_in", "n_chars_out", "changed"])


# ------------------------------------------------------- incremental LSH

def minhash_incremental_sql(modulus: int = 5, offset: int = 2_000_003,
                            n: int = 3, num_hashes: int = 32,
                            bands: int = 16,
                            threshold: float = 0.5) -> str:
    """Replica of dedup_lsh_incremental: corpus = docs ≡0 (mod 5),
    new batch = fresh docs ≡1 plus planted near-copies of the corpus;
    candidates are cross-batch band collisions only, then exact
    Jaccard — the same banding/verify arithmetic as _minhash_pairs
    restricted to (new, corpus) pairs."""
    rows_per_band = num_hashes // bands
    corpus = [(int(i), t) for i, t in read_table(
        "documents", "doc_id, text", f"doc_id % {modulus} = 0")]
    fresh = [(int(i), t) for i, t in read_table(
        "documents", "doc_id, text", f"doc_id % {modulus} = 1")]
    new = fresh + [(i + offset, t + PLANT_SUFFIX) for i, t in corpus]

    def sig_of(t: str):
        sh = shingles(tokens(t), n)
        if not sh:
            return None
        return (set(sh),
                [min(spark_xxhash64(s, k) for s in sh)
                 for k in range(num_hashes)])

    def bands_of(sig):
        return {
            (b, spark_xxhash64(
                *sig[b * rows_per_band:(b + 1) * rows_per_band]))
            for b in range(bands)
        }

    corpus_sigs = {i: sig_of(t) for i, t in corpus}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, s in corpus_sigs.items():
        if s is not None:
            for key in bands_of(s[1]):
                buckets[key].append(i)
    out = []
    for i, t in new:
        s = sig_of(t)
        if s is None:
            continue
        cands = set()
        for key in bands_of(s[1]):
            cands.update(buckets.get(key, ()))
        for c in sorted(cands):
            j = (len(s[0] & corpus_sigs[c][0])
                 / len(s[0] | corpus_sigs[c][0]))
            if j >= threshold:
                out.append((i, c, spark_round(j, 6)))
    out.sort()
    return values_sql(out, ["new_id", "corpus_id", "jaccard"])


# ------------------------------------------------------------- knn join

def knn_join_sql(k: int = 5, n_planes: int = 4, seed: int = 42,
                 query_modulus: int = 50, dim: int = 64) -> str:
    """DuckDB oracle for similarity.knn_join over embeddings: queries
    are vec_id % query_modulus = 0; rank ties break on c_id.

    Bucket signs are computed HERE in Python with Spark's exact
    fold-left summation order (_dot is a sequential aggregate();
    list_dot_product's association may differ near zero — the hazard
    lsh_near_dup_pairs_sql documents) and shipped as a VALUES map; the
    join and cosine rerank stay in SQL."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim))

    def fold_dot(v, p) -> float:
        acc = 0.0
        for x, y in zip(v, p):
            acc = acc + x * y
        return acc

    rows = read_table("embeddings", "vec_id, embedding")
    bmap = []
    for i, v in rows:
        v = [float(x) for x in v]
        bmap.append((int(i), "".join(
            "1" if fold_dot(v, p) >= 0 else "0" for p in planes)))
    buckets_values = values_sql(bmap, ["vec_id", "b"])

    return f"""
        WITH bk AS ({buckets_values}
        ), e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v, b
          FROM embeddings JOIN bk USING (vec_id)
        ), q AS (
          SELECT vec_id AS q_id, v AS qv, b
          FROM e WHERE vec_id % {query_modulus} = 0
        ), c AS (
          SELECT vec_id AS c_id, v AS cv, b FROM e
        ), j AS (
          SELECT q_id, c_id,
                 list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(cv, cv))) AS cos_raw
          FROM q JOIN c USING (b)
        ), r AS (
          SELECT q_id, c_id, cos_raw,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_raw DESC, c_id) AS rn
          FROM j
        )
        SELECT q_id, c_id, round(cos_raw, 6) AS cosine,
               CAST(rn AS INT) AS rank
        FROM r WHERE rn <= {k}"""


# --------------------------------------------------------- temperature mix

def temperature_mix_sql(temperature: float, target_frac: float = 0.5,
                        den: int = 10_000) -> str:
    """Replica of sampling.temperature_mix over documents: same
    histogram, same rate derivation in the same float operation order
    (sources summed SORTED — the operator pins this), same keyed-hash
    keep rule."""
    rows = read_table("documents", "doc_id, source, lang")
    counts: dict[str, int] = defaultdict(int)
    for _, src, _ in rows:
        if src is not None:
            counts[src] += 1
    alpha = 1.0 / temperature
    w = {s: float(c) ** alpha for s, c in counts.items() if c > 0}
    total_w = 0.0
    for s in sorted(w):
        total_w = total_w + w[s]
    n_total = sum(counts.values()) * target_frac
    rates = {}
    for s, c in counts.items():
        n_s = min(float(c), n_total * w[s] / total_w)
        rates[s] = min(den, int(n_s / c * den))
    out = [(int(i), src, lang) for i, src, lang in rows
           if spark_xxhash64(int(i)) % den < rates.get(src, den)]
    return values_sql(sorted(out), ["doc_id", "source", "lang"])


# --------------------------------------------------------------- winnowing

def winnow_sql(k: int = 4, w: int = 5, modulus: int = 4) -> str:
    """Replica of dedup.winnow_fingerprints over documents ≡0 (mod
    ``modulus``): chained-xxhash64 k-gram hashes, per-window minima,
    distinct-per-doc — the MOSS selection by value."""
    rows = read_table("documents", "doc_id, text",
                      f"doc_id % {modulus} = 0", order="doc_id")
    out = []
    for i, t in rows:
        toks = tokens(t)
        hs = [spark_xxhash64(*toks[j:j + k])
              for j in range(len(toks) - k + 1)] if len(toks) >= k else []
        if not hs:
            continue
        if len(hs) >= w:
            sel = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
        else:
            sel = [min(hs)]
        seen = set()
        for v in sel:
            if v not in seen:
                seen.add(v)
                out.append((int(i), v))
    return values_sql(out, ["doc_id", "fp"])


# ----------------------------------------------------------- LSH recall

def lsh_recall_sql(modulus: int = 5, n: int = 3, num_hashes: int = 32,
                   bands: int = 16, threshold: float = 0.5) -> str:
    """Replica of eval_lsh_recall: exact-Jaccard planted truth vs the
    banded pair list (the same _minhash_pairs replica the LSH oracle
    uses), reduced to the three counts."""
    docs = _docs_with_planted(modulus)
    base = {i: t for i, t in docs if i < PLANT_ID_OFFSET}
    copies = {i - PLANT_ID_OFFSET: t for i, t in docs
              if i >= PLANT_ID_OFFSET}
    truth = set()
    for i, t in base.items():
        sa = set(shingles(tokens(t), n))
        sb = set(shingles(tokens(copies[i]), n))
        if sa and sb and len(sa & sb) / len(sa | sb) >= threshold:
            truth.add(i)
    found = _minhash_pairs(docs, n, num_hashes, bands, threshold,
                           modulus=modulus)
    planted_found = {a for a, b, _ in found
                     if b - a == PLANT_ID_OFFSET}
    return values_sql(
        [(len(truth), len(truth & planted_found), len(found))],
        ["n_truth", "n_truth_found", "n_found_total"])


MATRIX_GRADE_PCTS = {1: 95, 2: 70, 3: 45}


def lsh_recall_matrix_sql(modulus: int = 20,
                          grade_offset: int = 10_000_000, n: int = 3,
                          configs=((32, 16), (64, 32), (64, 16)),
                          thresholds=(0.5, 0.7, 0.9)) -> str:
    """Replica of dedup.lsh_recall_matrix over the graded-plant corpus:
    same plant construction (raw single-space split, token PREFIX of
    pct percent, integer floor), same max-hash signature slice trick,
    same per-pair any-band-collides rule, same exact-Jaccard truth.
    Grade offsets are multiples of 10M so plant ids can never collide
    with base ids at test SFs (documented in the driver query)."""
    rows = read_table("documents", "doc_id, text",
                      f"doc_id % {modulus} = 0", order="doc_id")
    base = [(int(i), t) for i, t in rows]
    corpus = list(base)
    for g, pct in MATRIX_GRADE_PCTS.items():
        for i, t in base:
            toks = t.split(" ")
            keep = max(1, len(toks) * pct // 100)
            corpus.append((i + g * grade_offset, " ".join(toks[:keep])))
    max_h = max(nh for nh, _ in configs)
    sh_map: dict[int, set] = {}
    sig_map: dict[int, list[int]] = {}
    for i, t in corpus:
        sh = shingles(tokens(t), n)
        if not sh:
            continue
        sh_map[i] = set(sh)
        sig_map[i] = [min(spark_xxhash64(s, k) for s in sh)
                      for k in range(max_h)]
    jac: dict[tuple[int, int], float] = {}
    for g in MATRIX_GRADE_PCTS:
        for i, _ in base:
            a, b = i, i + g * grade_offset
            if a in sh_map and b in sh_map:
                sa, sb = sh_map[a], sh_map[b]
                jac[(i, g)] = len(sa & sb) / len(sa | sb)
    out = []
    for nh, bands in configs:
        rpb = nh // bands

        def band_hashes(sig, rpb=rpb, bands=bands):
            return [spark_xxhash64(*sig[b * rpb:(b + 1) * rpb])
                    for b in range(bands)]

        found = set()
        for (i, g) in jac:
            ha = band_hashes(sig_map[i])
            hb = band_hashes(sig_map[i + g * grade_offset])
            if any(x == y for x, y in zip(ha, hb)):
                found.add((i, g))
        for t in thresholds:
            truth = {p for p, j in jac.items() if j >= t}
            nt, nf = len(truth), len(truth & found)
            recall = 1.0 if nt == 0 else nf / nt
            out.append((nh, bands, float(t), nt, nf, recall))
    return values_sql(out, ["num_hashes", "bands", "threshold",
                            "n_truth", "n_truth_found", "recall"])


def shuffle_rank_sql(modulus: int = 3, seed: int = 7) -> str:
    """Replica of sampling.shuffle_rank over every modulus-th doc: sort
    by (spark_xxhash64(doc_id, seed), doc_id) — both 64-bit signed,
    matching the operator's long-cast seed — and emit dense 1-based
    ranks.  The replica never buckets; if the operator's range-bucket
    + offset lift disagreed with the plain total order anywhere, the
    hash check catches it."""
    rows = read_table("documents", "doc_id",
                      f"doc_id % {modulus} = 0")
    ids = [int(r[0]) for r in rows]
    order = sorted(ids, key=lambda i: (spark_xxhash64(i, seed), i))
    out = [(i, rank) for rank, i in enumerate(order, start=1)]
    return values_sql(out, ["doc_id", "shuffle_rank"])


def gif_frames_sql(modulus: int = 25, dim: int = 16,
                   stride: int = 2) -> str:
    """Replica of the gif-frames driver query: doc_id % modulus == 0
    docs become animated GIFs with F = i%3 + 2 FULL-SCREEN frames
    (w = i%6 + 3, h = i%4 + 2; frame f pattern idx = (i*5 + f*7 +
    y*w + x) % 16 over the shared 16-color palette, delay (i+f) % 100,
    no transparency, disposal 0) — full-screen opaque frames make the
    composited canvas equal each frame's OWN pattern, so this replica
    needs no compositing: it replays the pattern and the
    png_codec.pixel_features integer statistics per sampled frame.
    The Spark side runs the real LZW encode → frame walk →
    composite → featurize; the replica never touches any of it."""
    rows = read_table("documents", "doc_id", f"doc_id % {modulus} = 0")
    muls = (37, 59, 83)
    out = []
    for (i,) in rows:
        i = int(i)
        n_frames = i % 3 + 2
        w, h = i % 6 + 3, i % 4 + 2
        n = w * h
        for fi in range(0, n_frames, stride):
            idxs = [(i * 5 + fi * 7 + y * w + x) % 16
                    for y in range(h) for x in range(w)]
            chans = [[(k * m) % 256 for k in idxs] for m in muls]
            feats = _pattern_feats(chans, w, h, dim)
            out.append((f"img://{i}", fi, (i + fi) % 100, True)
                       + _emit_feats(feats, dim))
    return values_sql(out, ["media_ref", "frame_idx", "delay_cs",
                            "decode_ok", "f0", "f2", "f10", "f15"])


_IMA_STEP_TAB = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]
_IMA_ADJ_TAB = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_replay(ch0: list, spb: int = 129) -> list:
    """Scalar replay of one channel through the IMA ADPCM
    encode->decode round trip.  The decoder's step update mirrors the
    encoder's by construction, so the decoded stream IS the encoder's
    predictor sequence — one state machine, independently checking the
    production block-vectorized numpy decode byte path."""
    out = []
    idx = 0
    n = len(ch0)
    for start in range(0, n, spb):
        pred = ch0[start]
        out.append(pred)
        for t in range(1, spb):
            k = start + t
            sample = ch0[k] if k < n else ch0[n - 1]
            step = _IMA_STEP_TAB[idx]
            diff = sample - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            vp = step >> 3
            if diff >= step:
                nib |= 4
                diff -= step
                vp += step
            step >>= 1
            if diff >= step:
                nib |= 2
                diff -= step
                vp += step
            step >>= 1
            if diff >= step:
                nib |= 1
                vp += step
            pred = pred - vp if nib & 8 else pred + vp
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_ADJ_TAB[nib & 7]))
            out.append(pred)
    return out[:n]                     # fact-chunk trim of the pad


_MS_COEF1_TAB = [256, 512, 0, 192, 240, 460, 392]
_MS_COEF2_TAB = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT_TAB = [230, 230, 230, 230, 307, 409, 512, 614,
                 768, 614, 512, 409, 307, 230, 230, 230]


def _ms_replay(ch0: list, spb: int = 130) -> list:
    """Scalar replay of channel 0 through the MS-ADPCM encode->decode
    round trip (fixture encoder: predictor = block % 7 for channel 0,
    idelta carried across blocks from 16, truncating-division nibble
    quantizer; decoder arithmetic is the Microsoft spec's).  The
    decoded stream IS the encoder's reconstruction sequence — one
    state machine, independently checking the production
    block-vectorized numpy decode byte path."""
    out = []
    delta = 16
    n = len(ch0)
    for b, start in enumerate(range(0, n, spb)):
        c1 = _MS_COEF1_TAB[b % 7]
        c2 = _MS_COEF2_TAB[b % 7]
        s2 = ch0[start]
        s1 = ch0[start + 1] if start + 1 < n else s2
        out.extend((s2, s1))
        for t in range(2, spb):
            k = start + t
            sample = ch0[k] if k < n else ch0[n - 1]
            acc = s1 * c1 + s2 * c2
            pred = acc // 256 if acc >= 0 else -((-acc) // 256)  # C trunc
            err = sample - pred
            q = abs(err) // delta
            nib = max(-8, min(7, q if err >= 0 else -q))
            samp = max(-32768, min(32767, pred + nib * delta))
            s2, s1 = s1, samp
            delta = max(16, (_MS_ADAPT_TAB[nib & 0x0F] * delta) >> 8)
            out.append(samp)
    return out[:n]                     # fact-chunk trim of the pad


def _g711_replay(ch0: list, law: str) -> list:
    """Scalar replay of one channel through the G.711 encode->decode
    round trip: build the canonical 256-entry decode table, quantize
    each sample to the nearest table value (ties to the LOWER code —
    numpy argmin's first-minimum rule), return the decoded stream.
    The table arithmetic deliberately restates audio_meta's — the
    independent leg is the QUANTIZE path (scalar min-key vs numpy
    argmin over the byte stream); the table itself is double-entry
    pinned by the ITU anchor-point test, not by duplication."""
    tab = []
    for code in range(256):
        if law == "ulaw":
            u = ~code & 0xFF
            t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
            tab.append(0x84 - t if u & 0x80 else t - 0x84)
        else:
            a = code ^ 0x55
            t = (a & 0x0F) << 4
            seg = (a & 0x70) >> 4
            if seg == 0:
                t += 8
            elif seg == 1:
                t += 0x108
            else:
                t = (t + 0x108) << (seg - 1)
            tab.append(t if a & 0x80 else -t)
    out = []
    for s in ch0:
        best = min(range(256), key=lambda c: (abs(tab[c] - s), c))
        out.append(tab[best])
    return out


def audio_features_sql(modulus: int = 25, offset: int = 5) -> str:
    """Replica of the audio-features driver query: doc_id % modulus ==
    offset docs become WAVs with n = i%977 + 100 frames, channels =
    1 + i%2, rate = 8000 + (i%5)*8000, FORMAT rotating (pcm8, pcm16,
    pcm24, pcm32, float32, float64, extensible-pcm16, IMA ADPCM,
    MS-ADPCM, G.711 µ-law, G.711 A-law, FLAC) by i//modulus, and sample
    s[k, ch] = ((i*7 + k*13 + ch*5) % 65536) -
    32768 QUANTIZED to the 8-bit grid when needed (16/24/32/float/
    extensible are exact; IMA/MS are lossy so the replica replays each
    quantizer state machine, _ima_replay/_ms_replay) — then audio_meta.
    pcm_features' integer statistics in pure Python; the Spark side
    encodes a real WAV and decodes it back through the production
    Arrow kernel."""
    rows = read_table("documents", "doc_id",
                      f"doc_id % {modulus} = {offset}")
    out = []
    for (i,) in rows:
        i = int(i)
        n = i % 977 + 100
        channels = 1 + i % 2
        rate = 8000 + (i % 5) * 8000
        variant = (8, 16, 24, 32, "f32", "f64", "x16", "ima",
                   "ms", "ulaw", "alaw", "flac")[(i // modulus) % 12]
        # "flac" needs no replay: the codec is lossless, so the decoded
        # channel 0 IS the raw pattern (like pcm16)
        ch0 = [((i * 7 + k * 13) % 65536) - 32768 for k in range(n)]
        if variant == 8:
            # fixture quantizes to the 8-bit grid BEFORE encoding, and
            # decode maps (s//256 + 128) back exactly — floor division
            # mirrors make_wav_pcm
            ch0 = [(s // 256) * 256 for s in ch0]
        elif variant == "ima":
            ch0 = _ima_replay(ch0)
        elif variant == "ms":
            ch0 = _ms_replay(ch0)
        elif variant in ("ulaw", "alaw"):
            ch0 = _g711_replay(ch0, variant)
        feats = [n / 1048576.0, channels / 16.0, rate / 192000.0]
        sb = sum(ch0)
        qb = sum(s * s for s in ch0)
        feats.append(sb / (n * 32768.0))
        feats.append(qb / (n * 32768.0 * 32768.0))
        zc = sum(1 for a, b in zip(ch0, ch0[1:])
                 if (a >= 0) != (b >= 0))
        feats.append(zc / n)
        feats.append(max(abs(s) for s in ch0) / 32768.0)
        feats.append(sum(1 for s in ch0 if s != 0) / n)
        out.append((
            f"aud://{i}",
            True,
            spark_round(float(np.float32(feats[0])), 6),
            spark_round(float(np.float32(feats[3])), 6),
            spark_round(float(np.float32(feats[4])), 6),
            spark_round(float(np.float32(feats[5])), 6),
            spark_round(float(np.float32(feats[6])), 6),
        ))
    return values_sql(out, ["media_ref", "decode_ok", "f0", "f3", "f4",
                            "f5", "f6"])


def video_samples_sql(modulus: int = 25, offset: int = 10) -> str:
    """Replica of the video-samples driver query: doc_id % modulus ==
    offset docs become mdat-first MP4s with n = i%9 + 2 samples of
    size (i*3 + k*17) % 900 + 40, stts delta (i%4 + 1)*100 at
    timescale 1000, one chunk, stss sync every 2nd sample — so sample
    k's plan row is pure arithmetic: dts_ms = k*delta, byte_offset =
    28 + sum(sizes[:k]) (20-byte ftyp + 8-byte mdat header), is_sync =
    (k % 2 == 0).  The Spark side builds the real boxes and decodes
    them back through parse_sample_table; the replica never touches
    the MP4 layer."""
    rows = read_table("documents", "doc_id",
                      f"doc_id % {modulus} = {offset}")
    out = []
    for (i,) in rows:
        i = int(i)
        n = i % 9 + 2
        sizes = [(i * 3 + k * 17) % 900 + 40 for k in range(n)]
        delta = (i % 4 + 1) * 100
        off = 28
        for k in range(n):
            out.append((f"vid://{i}", k, k * delta, off, sizes[k],
                        k % 2 == 0, True))
            off += sizes[k]
    return values_sql(out, ["media_ref", "sample_idx", "dts_ms",
                            "byte_offset", "byte_size", "is_sync",
                            "decode_ok"])
