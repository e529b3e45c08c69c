"""Pipeline-surface queries: manifest ingestion (S2), image-folder scan +
decode (S1/S3 — through real ``binaryFile`` + ``mapInPandas``), training
metric aggregates (A5/A6), and the formatted display projection (P8/T3).
All oracle-checked; the fixture inputs live inside the package
(``fixtures/``) because the driver's sf dirs carry no manifest/images.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.images import decode_images, scan_image_folder
from .sources.manifest import read_manifest
from .sources.tables import load_table

_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
MANIFEST_PATH = os.path.join(_FIXTURES, "train_val.json")
IMAGES_ROOT = os.path.join(_FIXTURES, "images")
VIDEOS_ROOT = os.path.join(_FIXTURES, "videos")
CORPUS_JSONL = os.path.join(_FIXTURES, "corpus.jsonl")


# ---------------------------------------------------------------------------
# S2 — manifest scan + positional label resolution (J4 with OOB fallback)
# ---------------------------------------------------------------------------


def q_manifest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ``utils/precompute_features.py:136-144``: load
    ``{"train": [[label, relpath]], "categories": [...]}``, resolve each
    label positionally against the (dirty) vocabulary, 'Unknown' for
    out-of-bounds labels (``:158,208``). ``sf_dir`` unused — the manifest
    is a package fixture mirroring the reference's ``train_val.json``."""
    train, categories = read_manifest(spark, MANIFEST_PATH)
    out = (
        train.join(F.broadcast(categories), "label", "left")
        .withColumn("category", F.coalesce("category", F.lit("Unknown")))
        .withColumn(
            "relpath",
            F.regexp_replace("relpath", r"^caltech101/101_ObjectCategories/", ""),
        )
    )
    return out.select("label", "relpath", "category")


ORACLE_MANIFEST_SCAN = f"""
WITH m AS (SELECT * FROM read_json('{MANIFEST_PATH}')),
train AS (
  SELECT CAST(pair[1] AS INT) AS label,
         json_extract_string(pair[2], '$') AS relpath
  FROM (SELECT unnest(train) AS pair FROM m)
),
cats AS (
  SELECT s.label, s.category FROM (
    SELECT unnest([{{'label': i - 1, 'category': categories[i]}}
                   for i in range(1, len(categories) + 1)]) AS s
    FROM m)
)
SELECT t.label,
       regexp_replace(t.relpath, '^caltech101/101_ObjectCategories/', '') AS relpath,
       coalesce(c.category, 'Unknown') AS category
FROM train t LEFT JOIN cats c ON t.label = c.label
"""


# ---------------------------------------------------------------------------
# S1 + S3 — binaryFile folder scan → Arrow-batched decode
# ---------------------------------------------------------------------------


def q_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImageFolder scan (category = parent dir) through the real
    ``mapInPandas`` decode UDF; the stub decoder's dimensions are
    md5-derived so the oracle reproduces them exactly — this oracle-checks
    the *plumbing* (schema, batching, hashing), with the PIL body swapped
    in unchanged at deploy time."""
    scanned = scan_image_folder(spark, IMAGES_ROOT, glob="*.jpg")
    decoded = decode_images(scanned)
    return decoded.select(
        F.element_at(F.split("path", "/"), -1).alias("basename"),
        "category",
        F.col("length").alias("n_bytes"),
        "width",
        "height",
        "n_channels",
        "decode_ok",
    )


def _hex2int(col: str, pos: int) -> str:
    return (
        f"(CAST(strpos('0123456789abcdef', substr({col}, {pos}, 1)) - 1 AS INT) * 16"
        f" + CAST(strpos('0123456789abcdef', substr({col}, {pos + 1}, 1)) - 1 AS INT))"
    )


ORACLE_IMAGE_DECODE = f"""
WITH b AS (
  SELECT filename, content, md5(lower(hex(content))) AS h,
         octet_length(content) AS n_bytes
  FROM read_blob('{IMAGES_ROOT}/*/*.jpg')
)
SELECT list_extract(string_split(filename, '/'), -1) AS basename,
       list_extract(string_split(filename, '/'), -2) AS category,
       n_bytes,
       CASE WHEN n_bytes >= 4 THEN 64 + {_hex2int('h', 1)} % 192 ELSE NULL END AS width,
       CASE WHEN n_bytes >= 4 THEN 64 + {_hex2int('h', 3)} % 192 ELSE NULL END AS height,
       CASE WHEN n_bytes >= 4 THEN 3 ELSE NULL END AS n_channels,
       n_bytes >= 4 AS decode_ok
FROM b
"""


PPM_ROOT = os.path.join(_FIXTURES, "images_ppm")


def _decode_rows_query(
    spark: SparkSession, root: str, glob: str, with_md5: bool
) -> DataFrame:
    """Shared real-decode row shape for the PPM and JPEG registry
    queries: binaryFile scan → Arrow ``mapInPandas`` through
    ``decode_pixels`` → (basename, category, dims, corner RGB
    [, raster md5], decode_ok); per-row failures become
    ``decode_ok = false`` rows, never job failures (F2)."""
    from .sources.images import decode_pixels, scan_image_folder

    scanned = scan_image_folder(spark, root, glob=glob)
    n_null = 7 if with_md5 else 6

    def batches(it):
        import hashlib as _hl

        import pandas as pd

        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    arr = decode_pixels(content)
                    h, w, c = arr.shape
                    # exact 3-unpack: a non-RGB decode (1 or 4 channels
                    # from a future codec) must fail INSIDE the per-row
                    # try and become a decode_ok=false row, not build a
                    # wrong-length row that kills the whole batch
                    r0, g0, b0 = (int(x) for x in arr[0, 0])
                    row = [path, w, h, c, r0, g0, b0]
                    if with_md5:
                        row.append(_hl.md5(arr.tobytes()).hexdigest())
                    row.append(True)
                except Exception:
                    row = [path] + [None] * n_null + [False]
                out.append(tuple(row))
            cols = (
                ["path", "width", "height", "n_channels", "r0", "g0", "b0"]
                + (["pixel_md5"] if with_md5 else [])
                + ["decode_ok"]
            )
            yield pd.DataFrame(out, columns=cols)

    decoded = scanned.mapInPandas(
        batches,
        schema=(
            "path string, width int, height int, n_channels int, "
            "r0 int, g0 int, b0 int, "
            + ("pixel_md5 string, " if with_md5 else "")
            + "decode_ok boolean"
        ),
    )
    return decoded.select(
        F.element_at(F.split("path", "/"), -1).alias("basename"),
        F.element_at(F.split("path", "/"), -2).alias("category"),
        "width", "height", "n_channels", "r0", "g0", "b0",
        *(["pixel_md5"] if with_md5 else []),
        "decode_ok",
    )


def q_image_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode at the query surface, oracle-checked end-to-end: the
    fixture PPMs (fixed 17-byte ``P6\\n{w:04d} {h:04d}\\n255\\n`` header +
    raw raster) decode through the dependency-free numpy parser
    (``sources.images.decode_pixels``) — true dimensions AND the
    top-left pixel's actual RGB bytes — while the DuckDB oracle parses
    the same header fields and raster bytes straight out of the blob.
    Cross-engine agreement on genuine pixel math, no stub anywhere; a
    truncated raster surfaces as a ``decode_ok = false`` row (F2)."""
    return _decode_rows_query(spark, PPM_ROOT, "*.ppm", with_md5=False)


def _hx_byte(pos: int) -> str:
    """Byte at 1-based offset ``pos`` of the blob, as INT, read out of
    the full-blob hex string ``hx`` (UTF8-safe on arbitrary raster
    bytes — DuckDB blobs don't slice, but their hex encodings do)."""
    a, b = 2 * pos - 1, 2 * pos
    return (
        f"(CAST(strpos('0123456789abcdef', substr(hx, {a}, 1)) - 1 AS INT) * 16"
        f" + CAST(strpos('0123456789abcdef', substr(hx, {b}, 1)) - 1 AS INT))"
    )


def _hx_digits(first_byte: int, n: int) -> str:
    """Fixed-width ASCII decimal at bytes [first_byte, first_byte+n) →
    INT: each digit byte 0x3X contributes its low hex nibble."""
    chars = " || ".join(
        f"substr(hx, {2 * (first_byte + i)}, 1)" for i in range(n)
    )
    return f"CAST(({chars}) AS INT)"


ORACLE_IMAGE_DECODE_REAL = f"""
WITH b AS (
  SELECT filename, lower(hex(content)) AS hx, octet_length(content) AS n
  FROM read_blob('{PPM_ROOT}/*/*.ppm')
),
hdr AS (
  SELECT filename, hx, n,
         {_hx_digits(4, 4)} AS w,
         {_hx_digits(9, 4)} AS h
  FROM b
),
ok AS (SELECT *, n >= 17 + w * h * 3 AS good FROM hdr)
SELECT list_extract(string_split(filename, '/'), -1) AS basename,
       list_extract(string_split(filename, '/'), -2) AS category,
       CASE WHEN good THEN w END AS width,
       CASE WHEN good THEN h END AS height,
       CASE WHEN good THEN 3 END AS n_channels,
       CASE WHEN good THEN {_hx_byte(18)} END AS r0,
       CASE WHEN good THEN {_hx_byte(19)} END AS g0,
       CASE WHEN good THEN {_hx_byte(20)} END AS b0,
       good AS decode_ok
FROM ok
"""


JPEG_ROOT = os.path.join(_FIXTURES, "images_jpeg")


def q_image_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode at the query surface — the reference's
    primary corpus format (uploads accept jpg/jpeg, ``app.py:78``;
    Caltech101 is ``.jpg``, ``README.md:24-36``), decoded end-to-end by
    the dependency-free ``sources.images._parse_jpeg`` (Huffman + IDCT +
    color transform) through the same Arrow ``mapInPandas`` seam as
    every other codec.

    Oracle: image dimensions are parsed straight out of the blob's SOF0
    marker bytes in SQL (independent of any Python); the pixel truths
    (corner RGB + full-raster md5) come from the committed
    ``expected.csv`` sidecar, generated by the test-side DIRECT-IDCT
    reference reconstruction (scripts/make_jpeg_fixtures.py) — never by
    the engine's own decoder. The progressive-coded fixture exercises
    the ``decode_ok = false`` error-tolerance row (F2)."""
    return _decode_rows_query(spark, JPEG_ROOT, "*.jpg", with_md5=True)


def _hx_pair_at(off_expr: str) -> str:
    """Hex pair at dynamic 1-based char offset ``off_expr`` of ``hx`` → INT."""
    return (
        f"(CAST(strpos('0123456789abcdef', substr(hx, {off_expr}, 1)) - 1 AS INT) * 16"
        f" + CAST(strpos('0123456789abcdef', substr(hx, ({off_expr}) + 1, 1)) - 1 AS INT))"
    )


# SOF0 layout after the byte-aligned ffc0 marker (hex char position p):
# length(2B) precision(1B) height(2B) width(2B) → height at chars p+10,
# width at chars p+14 (each 2 bytes big-endian). Alignment guard: a hex
# substring match at an EVEN char position straddles two bytes (e.g.
# ..5f ff c0.. matching one char early) — only odd p is a real marker;
# a misaligned first match nulls the dims, which fails the row loudly
# at fixture-generation time instead of parsing garbage. (Fixture
# scope: baseline files from make_jpeg_fixtures.py with no APPn
# segments, so the first aligned ffc0 IS the frame header; an
# EXIF-thumbnail-bearing JPEG would need a real marker walk.)
ORACLE_IMAGE_DECODE_JPEG = f"""
WITH b AS (
  SELECT filename, lower(hex(content)) AS hx
  FROM read_blob('{JPEG_ROOT}/*/*.jpg')
),
sof AS (
  SELECT filename, hx,
         CASE WHEN strpos(hx, 'ffc0') % 2 = 1
              THEN strpos(hx, 'ffc0') ELSE 0 END AS p
  FROM b
),
dims AS (
  SELECT list_extract(string_split(filename, '/'), -1) AS basename,
         list_extract(string_split(filename, '/'), -2) AS category,
         CASE WHEN p > 0
              THEN {_hx_pair_at('p + 10')} * 256 + {_hx_pair_at('p + 12')}
         END AS height,
         CASE WHEN p > 0
              THEN {_hx_pair_at('p + 14')} * 256 + {_hx_pair_at('p + 16')}
         END AS width
  FROM sof
),
exp AS (
  SELECT * FROM read_csv('{JPEG_ROOT}/expected.csv', header = true)
)
SELECT d.basename, d.category, d.width, d.height,
       CASE WHEN e.decode_ok THEN 3 END AS n_channels,
       CAST(e.r0 AS INT) AS r0, CAST(e.g0 AS INT) AS g0,
       CAST(e.b0 AS INT) AS b0,
       nullif(e.pixel_md5, '') AS pixel_md5,
       e.decode_ok
FROM dims d JOIN exp e USING (basename)
"""


def q_image_knn_pipeline(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> DataFrame:
    """The reference's ENTIRE flagship flow end-to-end with real pixel
    math and zero stubs: image-folder scan → dependency-free decode →
    resize → pool → projection embed → cosine kNN among the decoded
    images (``app.py:124-179`` condensed to one plan). Failed decodes
    (the truncated fixture) drop out at the F2 gate exactly as the
    reference's error-tolerant loader skips corrupt files.

    FULL DuckDB oracle since round 6 (previously the registry's one
    rows-only entry): the embed uses ``embed_images_int`` — resize and
    block-SUM pooling stay in uint8/int64, the projection is the shared
    quantized-integer matrix (``int_projection_weights``, inlined into
    the oracle as literals) — so every embedding coordinate is an EXACT
    int64 both engines derive independently from the raster bytes, and
    the cosine ranking is computed from exact int64 dots
    (``functions.vector.int_dot`` ≡ BIGINT ``list_reduce``) with one
    identical double division at the end. Pixel bytes → top-k ranks,
    value-exact across engines.

    ``root`` parameterizes the image tree (default: the committed PPM
    fixtures) so the generated-corpus fuzz panel can drive the SAME
    end-to-end body over fresh rasters (P6 + truncated classes — the
    oracle's raster-size gate assumes 3-channel rasters)."""
    from .functions.vector import int_dot
    from .sources.images import embed_images_int, scan_image_folder

    scanned = scan_image_folder(spark, root or PPM_ROOT, glob="*.ppm")
    embedded = (
        embed_images_int(scanned, dim=16)
        .filter(F.col("decode_ok"))
        .select(
            F.concat_ws(
                "/", "category", F.element_at(F.split("path", "/"), -1)
            ).alias("img"),
            "category",
            "embedding",
        )
    )
    # NOTE: hand-rolled top-k rather than operators.knn.knn_join — the
    # exact-integer cosine is not one of knn_join's (float-fold) metrics,
    # and the whole point here is the int64 dot both engines reproduce
    # bit-for-bit. Norms are computed ONCE per vector before the pair
    # join (identical bits to recomputing per pair; O(N) not O(N²)).
    q = embedded.select(
        F.col("img").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.sqrt(int_dot("embedding", "embedding").cast("double")).alias("qn"),
    )
    n = embedded.select(
        F.col("img").alias("neighbor"), "category",
        F.col("embedding").alias("ne"),
        F.sqrt(int_dot("embedding", "embedding").cast("double")).alias("nn"),
    )
    cos = int_dot("qe", "ne").cast("double") / F.greatest(
        F.col("qn") * F.col("nn"), F.lit(1e-12)
    )
    pairs = (
        q.join(F.broadcast(n), F.col("query_id") != F.col("neighbor"))
        .withColumn("cos_sim", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos_sim").desc(), F.col("neighbor").asc()
                )
            ),
        )
        .filter(F.col("rank") <= 2)
    )
    return pairs.select("query_id", "neighbor", "category", "cos_sim", "rank")


def _oracle_image_knn_pipeline(
    dim: int = 16, size: int = 32, pool: int = 8, root: str | None = None
) -> str:
    """Mirror of the flagship pipeline, raster bytes to ranks: PPM
    header + per-pixel hex parse → nearest-resize index arithmetic →
    block sums → the SAME quantized weights as SQL literals → exact
    BIGINT dots → one double division → rank. ``root`` re-roots the
    blob scan for the generated-corpus fuzz panel."""
    from .sources.images import int_projection_weights

    block = size // pool
    feat_dim = pool * pool * 3
    wq = int_projection_weights(feat_dim, dim)
    wvals = ",".join(
        f"({fi},{j},{int(wq[fi, j])})"
        for fi in range(feat_dim)
        for j in range(dim)
    )
    # pixel byte offset (0-based): 17-byte header + row-major RGB raster;
    # nearest-resize source index = min((y*h)//size, h-1) etc.
    off0 = (
        f"17 + (least((y.y * h) // {size}, h - 1) * w "
        f"+ least((x.x * w) // {size}, w - 1)) * 3 + c.c"
    )
    pixval = (
        f"(CAST(strpos('0123456789abcdef', substr(hx, 2 * ({off0}) + 1, 1)) - 1 AS BIGINT) * 16"
        f" + CAST(strpos('0123456789abcdef', substr(hx, 2 * ({off0}) + 2, 1)) - 1 AS BIGINT))"
    )
    idot = (
        "list_reduce(list_transform(list_zip({a}, {b}), "
        "s -> s[1] * s[2]), (x, y) -> x + y)"
    )
    return f"""
WITH b AS (
  SELECT filename, lower(hex(content)) AS hx, octet_length(content) AS n
  FROM read_blob('{root or PPM_ROOT}/*/*.ppm')
),
hdr AS (
  SELECT filename, hx, n,
         {_hx_digits(4, 4)} AS w,
         {_hx_digits(9, 4)} AS h
  FROM b
),
ok AS (SELECT filename, hx, w, h FROM hdr WHERE n >= 17 + w * h * 3),
feats AS (
  SELECT o.filename,
         ((y.y // {block}) * {pool} + (x.x // {block})) * 3 + c.c AS fi,
         CAST(SUM({pixval}) AS BIGINT) AS f
  FROM ok o, range(0, {size}) y(y), range(0, {size}) x(x), range(0, 3) c(c)
  GROUP BY 1, 2
),
wts(fi, j, wq) AS (VALUES {wvals}),
emb AS (
  SELECT f.filename, wt.j, CAST(SUM(f.f * wt.wq) AS BIGINT) AS e
  FROM feats f JOIN wts wt USING (fi) GROUP BY 1, 2
),
vecs AS (
  SELECT filename,
         list_extract(string_split(filename, '/'), -2) || '/' ||
           list_extract(string_split(filename, '/'), -1) AS img,
         list_extract(string_split(filename, '/'), -2) AS cat,
         list(e ORDER BY j ASC) AS v
  FROM emb GROUP BY filename
),
normed AS (
  SELECT *, sqrt(CAST({idot.format(a='v', b='v')} AS DOUBLE)) AS nrm
  FROM vecs
),
pairs AS (
  SELECT q.img AS query_id, nb.img AS neighbor, nb.cat AS category,
         CAST({idot.format(a='q.v', b='nb.v')} AS DOUBLE) /
           greatest(q.nrm * nb.nrm, 1e-12) AS cos_sim
  FROM normed q JOIN normed nb ON q.img <> nb.img
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor, category, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 2
"""


# ---------------------------------------------------------------------------
# Video frame sampling (multimodal breadth: 1 row → k frame rows)
# ---------------------------------------------------------------------------


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile video scan → Arrow-batched frame sampling
    (``sources.media.sample_frames``): every 2nd frame of each payload,
    one input row exploding to many output rows inside the Arrow batch,
    short payloads surfacing as error rows. Stub codec (md5-derived frame
    digests) so the oracle verifies the full explode/error plumbing."""
    from .sources.media import sample_frames

    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mp4")
        .load(VIDEOS_ROOT)
    )
    frames = sample_frames(scanned, stride=2)
    return frames.select(
        F.element_at(F.split("path", "/"), -1).alias("basename"),
        "n_frames",
        "frame_idx",
        "frame_ms",
        "frame_hash",
        "decode_ok",
    )


def _oracle_frame_sample() -> str:
    from .queries_text import _dk_hex15_to_long

    h = _dk_hex15_to_long(
        "md5(concat(lower(hex(content)), ':', CAST(f AS VARCHAR)))"
    )
    return f"""
WITH b AS (
  SELECT filename, content, octet_length(content) AS n
  FROM read_blob('{VIDEOS_ROOT}/*.mp4')
),
ok AS (
  SELECT filename, content, CAST(floor(n / 256) AS INT) AS n_frames
  FROM b WHERE n >= 256
),
frames AS (
  SELECT filename, content, n_frames,
         unnest(range(0, n_frames, 2)) AS f
  FROM ok
)
SELECT list_extract(string_split(filename, '/'), -1) AS basename,
       n_frames, CAST(f AS INT) AS frame_idx,
       (CAST(f AS DOUBLE) * 1000.0) / 25.0 AS frame_ms,
       {h} AS frame_hash,
       TRUE AS decode_ok
FROM frames
UNION ALL
SELECT list_extract(string_split(filename, '/'), -1),
       NULL, NULL, NULL, NULL, FALSE
FROM b WHERE n < 256
"""


# ---------------------------------------------------------------------------
# JSONL corpus ingestion (the standard LLM training-corpus wire format)
# ---------------------------------------------------------------------------


def q_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-delimited JSON corpus → typed rows → per-source rollup
    with exact-dup counting, in one pass: the first stage of every real
    corpus intake. `spark.read.json` schema-on-reads each line in
    parallel (line-splittable at 100 TB, unlike multiline JSON); the
    rollup counts docs, tokens, and how many rows are exact duplicates
    of an earlier doc (window over md5(text))."""
    docs = spark.read.json(CORPUS_JSONL).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        "text",
    )
    from .functions.text import tokens

    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    enriched = docs.select(
        "doc_id",
        "source",
        F.size(tokens("text")).alias("n_tokens"),
        (F.row_number().over(w) > 1).alias("is_dup"),
    )
    return enriched.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).cast("long").alias("n_dups"),
    )


def _oracle_jsonl_ingest() -> str:
    from .queries_text import _dk_toks

    return f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, source, text
  FROM read_json_auto('{CORPUS_JSONL}', format='newline_delimited')
),
e AS (
  SELECT doc_id, source, len({_dk_toks()}) AS n_tokens,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY doc_id ASC) > 1 AS is_dup
  FROM d
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
FROM e GROUP BY source
"""


# ---------------------------------------------------------------------------
# A5/A6 — training metric aggregates (epoch loss mean, accuracy ratio)
# ---------------------------------------------------------------------------


def q_train_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-epoch metric reduction (``train_model.py:78-103``):
    running mean of a loss and Σcorrect/Σtotal accuracy. Batches are
    simulated deterministically from the embeddings table (epoch =
    vec_id % 4, pred = hash-derived); the aggregation shape — partial
    map-side sums, one tiny shuffle per epoch key — is the real contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    sim = emb.select(
        (F.col("vec_id") % 4).alias("epoch"),
        ((F.col("vec_id") * 37 + 11) % 1000).cast("double").alias("loss_x1000"),
        ((F.col("vec_id") * 7 + 3) % 10).alias("pred"),
        "label",
    )
    return (
        sim.groupBy("epoch")
        .agg(
            # raw doubles: divisions/products of exact integer sums are
            # bit-identical cross-engine when the operand order matches
            # the oracle (sum/count/1000.0; sum*100.0/count); rounding is
            # the .5-tie hazard (min_cost_order class, CHANGES_r05)
            (F.sum("loss_x1000") / F.count("*") / 1000.0).alias("avg_loss"),
            (
                F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
                * 100.0
                / F.count("*")
            ).alias("accuracy_pct"),
            F.count("*").alias("n_samples"),
        )
        .orderBy("epoch")
    )


ORACLE_TRAIN_METRICS = """
WITH sim AS (
  SELECT vec_id % 4 AS epoch,
         CAST((vec_id * 37 + 11) % 1000 AS DOUBLE) AS loss_x1000,
         (vec_id * 7 + 3) % 10 AS pred,
         label
  FROM embeddings
)
SELECT epoch,
       sum(loss_x1000) / count(*) / 1000.0 AS avg_loss,
       sum(CASE WHEN pred = label THEN 1 ELSE 0 END) * 100.0 / count(*)
         AS accuracy_pct,
       count(*) AS n_samples
FROM sim GROUP BY epoch ORDER BY epoch
"""


# ---------------------------------------------------------------------------
# P8 + T3 — formatted result display (score strings, 5-wide result grid)
# ---------------------------------------------------------------------------
# knn_display retired r12 (one-for-one with the perplexity_buckets
# registration — write-ahead candidate #3 in queries.py): its top-k
# ranking surface stays covered by the registered search_batch (the
# batched kNN superset); the P8/T3 display projection itself (the
# `%.4f` score string + 5-wide grid chunk, reference
# utils/__init__.py:130-152) is a stateless column projection that
# lives on as :func:`score_grid` below, pinned by
# tests/test_pipeline_queries.py against the Python formatter.


def score_grid(ranked: DataFrame, dist_col: str = "dist_exact",
               rank_col: str = "rank", per_row: int = 5) -> DataFrame:
    """P8 + T3 — the reference's result rendering
    (``utils/__init__.py:130-152``): ``f"{score:.4f}"`` score strings
    and ``per_row``-wide grid chunking over any ranked kNN result.
    Pure projection — composes onto ``search_batch``/``knn_single``
    output with zero plan cost (no shuffle, stays in codegen)."""
    return ranked.select(
        "vec_id",
        F.format_number(F.col(dist_col), 4).alias("dist_str"),
        F.floor((F.col(rank_col) - 1) / per_row).cast("int").alias("grid_row"),
        ((F.col(rank_col) - 1) % per_row).cast("int").alias("grid_col"),
    )


PIPELINE_QUERIES = {
    "manifest_scan": q_manifest_scan,
    "image_decode_real": q_image_decode_real,
    "image_decode_jpeg": q_image_decode_jpeg,
    "image_knn_pipeline": q_image_knn_pipeline,
    "frame_sample": q_frame_sample,
    "jsonl_ingest": q_jsonl_ingest,
    "train_metrics": q_train_metrics,
}

PIPELINE_ORACLES = {
    "manifest_scan": ORACLE_MANIFEST_SCAN,
    "image_decode_real": ORACLE_IMAGE_DECODE_REAL,
    "image_decode_jpeg": ORACLE_IMAGE_DECODE_JPEG,
    "image_knn_pipeline": _oracle_image_knn_pipeline(),
    "frame_sample": _oracle_frame_sample(),
    "jsonl_ingest": _oracle_jsonl_ingest(),
    "train_metrics": ORACLE_TRAIN_METRICS,
}
