"""Document deduplication for training-data pipelines (engine
extension; SURVEY.md §7 Phase 4): exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine.

Scale design:
* exact / fingerprint dedup → one hash-groupBy (map-side combined);
* Jaccard verification joins only on shared shingles, never all-pairs;
* MinHash+LSH makes the candidate set ~linear: signature (one scan) →
  band buckets (explode b rows/doc) → candidates only within buckets;
* everything JVM-side (xxhash64 / array exprs), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textops import fingerprint, shingles, tokens


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str, normalized: bool = False) -> DataFrame:
    """Exact (or normalized-fingerprint) duplicate groups: one
    hash-groupBy; keeps the min id as the canonical representative."""
    key = fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    return (
        df.groupBy(key.alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    toks = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select("id", shingles(F.col("toks"), n).alias("sh"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs.

    shingle → explode → self-equi-join on the shingle (only docs that
    SHARE a shingle ever meet — the join key is the pruning) → per-pair
    intersection count → |A∪B| = |A|+|B|−∩.

    At 100 TB this is the *verification* stage; candidate pruning
    should come from ``minhash_lsh_candidates`` first. Skew note: a
    stop-shingle shared by everything would explode the join — callers
    can pre-filter high-doc-frequency shingles.
    """
    sh = _shingled(df, id_col, text_col, n).cache()
    sizes = sh.select("id", F.size("sh").alias("sz"))
    ex = sh.select("id", F.explode("sh").alias("s"))
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    return (
        pairs.join(sizes.select(F.col("id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _seeded_hash(i: int):
    # closure factory: a default-arg lambda would change the lambda's
    # arity and make PySpark pass the array index as the "seed"
    return lambda x: F.xxhash64(F.lit(str(i)), x)


def minhash_signature(sh: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as an array expression: for seed i, min over
    shingles of xxhash64(i ‖ shingle). One pass, no explode."""
    return F.array(
        *[F.array_min(F.transform(sh, _seeded_hash(i))) for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash + LSH banding: candidate near-dup pairs.

    signature (num_hashes mins) → split into ``bands`` bands of
    ``num_hashes/bands`` rows → hash each band → explode to
    (band_id, band_hash) → docs colliding in ANY band pair up.
    Output: (doc_a, doc_b, n_bands_shared) — feed to
    ``ngram_jaccard_pairs`` on the candidate subset to verify.
    """
    rows_per_band = num_hashes // bands
    sh = _shingled(df, id_col, text_col, n)
    sig = sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    return (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def simhash64(toks: Column) -> Column:
    """64-bit SimHash of a token array as a pure array expression: per
    bit j, sign of Σ_tokens (±1 by bit j of xxhash64(token))."""
    def bit_vote(j: int):
        return lambda acc, t: acc + F.when(
            F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(toks, F.lit(0), bit_vote(j)) for j in range(64)]
    out = F.lit(0).cast("long")
    for j, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1).cast("long") * (2**j if j < 63 else -(2**63))).otherwise(0)
    return out


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) via the scale formulation: explode tokens, hash
    each token ONCE, then one groupBy folding 64 bit-vote sums.

    The array-expression variant (``simhash64``) folds the token array
    64 times through non-codegen higher-order functions, re-hashing
    every token per bit — ~10× slower. Here hashing is a single
    codegen'd pass and the 64 votes ride map-side partial aggregation,
    so the shuffle carries 64 ints per doc regardless of doc length —
    the formulation that survives 100 TB.
    """
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(F.col(text_col))).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    vote = lambda j: F.sum(
        F.when(F.col("h").isNull(), 0)
        .when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
    ).alias(f"b{j}")
    votes = hashed.groupBy("id").agg(*[vote(j) for j in range(64)])
    sh = F.lit(0).cast("long")
    for j in range(64):
        sh = sh + F.when(
            F.col(f"b{j}") > 0, F.lit(1).cast("long") * (2**j if j < 63 else -(2**63))
        ).otherwise(0)
    return votes.select("id", sh.alias("sh"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: block on the top ``prefix_bits`` of the
    simhash (docs within small hamming distance usually share the
    prefix block), then verify hamming ≤ ``max_hamming`` via
    bit_count(xor). Multi-table permutation blocking is the full-recall
    variant; one block keeps the demo linear."""
    base = simhash_table(df, id_col, text_col)
    blocked = base.withColumn("blk", F.shiftrightunsigned("sh", 64 - prefix_bits))
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            ham.alias("hamming"),
        )
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_bits: int = 8,
) -> DataFrame:
    """Embedding near-dup pairs: sign-bit LSH block (first
    ``block_bits`` dims) then exact cosine within blocks — the
    embedding-space analog of fingerprint-then-verify."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    blk = F.concat_ws(
        "",
        *[F.when(F.element_at(v, i + 1) >= 0, "1").otherwise("0") for i in range(block_bits)],
    )
    base = df.select(F.col(id_col).alias("id"), v.alias("v"), norm.alias("nrm"), blk.alias("blk"))
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        base.alias("a")
        .join(base.alias("b"), (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
