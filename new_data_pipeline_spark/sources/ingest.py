"""Declarative ingest: the reference's job-spec surface re-expressed as
``spark.read`` plans.

The reference accepts a JSON job spec declaring input/output streams
with a ``dataType`` tag (image | numeric | text) plus per-type options,
then hand-schedules reader threads (reference server.py:131-147,
serialize.py:473-620). Here the same spec compiles to DataFrame plans —
Catalyst schedules; a config dict is the whole "planner".

Operators covered (SURVEY.md §2.1):
- S2/S3 archive prep         → prepare_archive (driver-side extract)
- S4 labeled image dir scan  → binaryFile + label from the path
- S5 multi-image-per-record  → per-subdir rank join on (label, rank)
- S6 binding-driven scan     → binding table joined to file scan on path
- S7 CSV source              → spark.read.csv
- S8 JSON source (2 layouts) → spark.read.json (+ explode for data_key)
- T6 type dispatch           → the ``dataType`` match below

Scale notes: binaryFile scans parallelize over files; the label regex
is evaluated JVM-side; the S5 rank join shuffles each stream once on
(label, rank). Image *decode* is deliberately not here — it lives in
operators/multimodal.py as an Arrow-batched mapInPandas stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from new_data_pipeline_spark.sources.tensorize import assign_keys

# path layout: .../<label>/<filename>  (reference serialize.py:49-64 walks
# data_dir/<label>/<image>, label = parent directory name)
_LABEL_RE = r".*/([^/]+)/[^/]+$"
_STEM_RE = r".*/([^/]+)\.[^./]+$"


def read_labeled_image_dir(spark: SparkSession, data_dir: str,
                           ext: str = "*") -> DataFrame:
    """S4: scan ``data_dir/<label>/<file>`` → (path, label, content, length).

    The reference cv2.imread's each file sequentially
    (serialize.py:44-64); here the binaryFile source lists and reads
    files partition-parallel and the label is a regexp over
    input_file_name — no Python in the scan.
    """
    df = (spark.read.format("binaryFile")
          .option("pathGlobFilter", f"*.{ext}" if ext != "*" else "*")
          .load(f"{data_dir.rstrip('/')}/*/*"))
    return df.select(
        F.col("path"),
        F.regexp_extract("path", _LABEL_RE, 1).alias("label"),
        F.regexp_extract("path", _STEM_RE, 1).alias("stem"),
        F.col("length"),
        F.col("content"))


def read_mimo_image_dirs(spark: SparkSession, data_dir: str,
                         subdirs: list[str]) -> DataFrame:
    """S5: N sibling subdirs, each ``<subdir>/<label>/<file>``; the i-th
    file (sorted) of every subdir under the same label forms one record.

    The reference zips sorted directory listings in memory
    (serialize.py:66-113); the distributed equivalent ranks files per
    (subdir, label) by filename and N-way-joins on (label, rank).
    """
    streams = []
    for sd in subdirs:
        s = (spark.read.format("binaryFile")
             .load(f"{data_dir.rstrip('/')}/{sd}/*/*")
             .select(F.lit(sd).alias("stream"),
                     F.regexp_extract("path", _LABEL_RE, 1).alias("label"),
                     F.col("path"), F.col("content")))
        from pyspark.sql import Window
        w = Window.partitionBy("label").orderBy("path")
        streams.append(
            s.withColumn("rank", F.row_number().over(w))
             .select("label", "rank",
                     F.col("path").alias(f"path_{sd}"),
                     F.col("content").alias(f"content_{sd}")))
    out = streams[0]
    for s in streams[1:]:
        out = out.join(s, ["label", "rank"], "inner")
    return out


def read_binding_scan(spark: SparkSession, binding_df: DataFrame,
                      stem_col: str, data_dir: str,
                      extension: str) -> DataFrame:
    """S6: a binding table names the file stem per record; join it to the
    directory scan on the reconstructed path.

    The reference read ``dir/<stem><extension>`` per row inside the
    reader thread (serialize.py:28-40); joining the scan instead keeps
    file I/O partition-parallel and lets missing files surface as
    left-join nulls rather than crashes.
    """
    files = (spark.read.format("binaryFile")
             .load(f"{data_dir.rstrip('/')}/*{extension}")
             .select(F.regexp_extract("path", _STEM_RE, 1).alias("stem"),
                     F.col("path"), F.col("content")))
    return binding_df.join(files, binding_df[stem_col] == files["stem"], "left")


def read_numeric_csv(spark: SparkSession, path: str,
                     header: bool = True) -> DataFrame:
    """S7: CSV → DataFrame (schema inference mirrors pd.read_csv,
    reference serialize.py:118-123; production passes an explicit schema)."""
    return (spark.read.option("header", str(header).lower())
            .option("inferSchema", "true").csv(path))


def read_json_records(spark: SparkSession, path: str,
                      data_key: str | None = None) -> DataFrame:
    """S8: JSON list-of-records, or a dict whose ``data_key`` holds the
    list (reference serialize.py:124-141,198-215)."""
    if data_key is None:
        return spark.read.option("multiLine", "true").json(path)
    raw = spark.read.option("multiLine", "true").json(path)
    return raw.select(F.explode(F.col(data_key)).alias("rec")).select("rec.*")


def prepare_archive(archive_path: str, dest_dir: str | None = None) -> str:
    """S2/S3 driver-side prep: extract a .zip / .tar(.gz|.bz2|.xz)
    dataset archive and return the extracted directory, ready to feed
    ``plan`` / ``read_labeled_image_dir``.

    The reference fetches a URL to a local file (server.py:90-129) and
    unzips it next to the job workspace (server.py:159-173) before any
    ingest runs — a one-shot driver-side step, not an engine operator
    (SURVEY.md §2.1 scoped S2/S3 out of the engine for that reason).
    This helper is that step for local archives, with the zip-slip
    validation the reference lacks: any member whose resolved path
    escapes the destination aborts the extract. Remote URLs are the
    caller's transport concern (this environment is offline by policy).

    At 100 TB archives are the wrong container — the production path is
    parquet/binaryFile directories; this exists so a reference job spec
    pointing at an archive replays end-to-end.
    """
    import os
    import tarfile
    import zipfile

    if dest_dir is None:
        base, _ = os.path.splitext(archive_path)
        dest_dir = base + "_extracted"
    dest_dir = os.path.abspath(dest_dir)
    os.makedirs(dest_dir, exist_ok=True)

    def _check(name: str) -> None:
        target = os.path.abspath(os.path.join(dest_dir, name))
        if not (target + os.sep).startswith(dest_dir + os.sep) \
                and target != dest_dir:
            raise ValueError(f"archive member escapes destination: {name!r}")

    if zipfile.is_zipfile(archive_path):
        with zipfile.ZipFile(archive_path) as zf:
            for m in zf.namelist():
                _check(m)
            zf.extractall(dest_dir)
    elif tarfile.is_tarfile(archive_path):
        with tarfile.open(archive_path) as tf:
            for m in tf.getmembers():
                _check(m.name)
                if m.issym() or m.islnk():
                    raise ValueError(
                        f"archive contains link member: {m.name!r}")
            # filter="data" (stdlib tar extraction filters, 3.11.4+) is
            # the actual hardening: beyond the escape/link pre-checks
            # above (kept for the clearer error messages) it REJECTS
            # special members (device nodes, FIFOs) and STRIPS unsafe
            # mode bits (setuid/setgid/sticky, group/world write) that
            # extractall would otherwise apply verbatim while running
            # privileged (ADVICE r9).
            tf.extractall(dest_dir, filter="data")
    else:
        raise ValueError(f"not a zip or tar archive: {archive_path!r}")
    return dest_dir


def plan(spark: SparkSession, spec: dict) -> dict[str, DataFrame]:
    """Compile a reference-style job spec into keyed stream DataFrames.

    Spec shape (mirroring the JSON POST body, server.py:131-147):
    ``{"input": [{...stream...}], "output": [{...stream...}]}`` where a
    stream is ``{"dataType": "image"|"numeric"|"text"|"json",
    "path"|...per-type options...}``. Returns
    ``{"datumdb0": df, ..., "labeldb0": df, ...}`` — the reference's
    LMDB sub-database names (serialize.py:456-471) kept as stream names.
    Every stream gets a contiguous 1-based ``key`` (K1) so MIMO
    alignment is an equi-join on key.
    """
    out: dict[str, DataFrame] = {}

    def build(stream_spec: dict) -> DataFrame:
        if "archive" in stream_spec:  # S2/S3: spec points at an archive
            stream_spec = {**stream_spec,
                           "path": prepare_archive(stream_spec["archive"])}
        dt = stream_spec["dataType"]
        if dt == "image":
            df = read_labeled_image_dir(spark, stream_spec["path"],
                                        stream_spec.get("extension", "*"))
            order = "path"
        elif dt == "numeric":
            df = read_numeric_csv(spark, stream_spec["path"])
            order = df.columns[0]
        elif dt in ("text", "json"):
            df = read_json_records(spark, stream_spec["path"],
                                   stream_spec.get("data_key"))
            order = df.columns[0]
        else:
            raise ValueError(f"unknown dataType {dt!r}")  # T6 unknown-tag exit
        return assign_keys(df, order_col=order)

    for i, s in enumerate(spec.get("input", [])):
        out[f"datumdb{i}"] = build(s)
    for j, s in enumerate(spec.get("output", [])):
        out[f"labeldb{j}"] = build(s)
    return out
