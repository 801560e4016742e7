"""Iceberg table read path WITHOUT the iceberg-spark-runtime jar.

Reference: crates/connectors/src/sources/iceberg/provider.rs:229-540 —
lazy snapshot loading, manifest walking, data-file listing, time
travel. The iceberg-spark-runtime integration (sources/iceberg.py)
remains the full-featured path (hidden partitioning, merge-on-read
deletes, writes); this module covers the READ side of an
Iceberg-on-parquet table from first principles, because every layer is
already present in a stock Spark distribution:

- table metadata: plain JSON (``metadata/vN.metadata.json``, pointed to
  by ``version-hint.text``);
- manifest lists + manifests: Avro container files, read through the
  JVM's avro-1.x jar (bundled with Spark core) via the py4j gateway —
  battle-tested decode, driver-side only, and manifests are KB-sized
  metadata, never data;
- data files: parquet, scanned by Spark's normal reader executor-side
  with full pushdown/pruning on the resulting DataFrame.

Snapshot semantics: an Iceberg snapshot's manifest list enumerates the
COMPLETE live state of the table at that snapshot (not a delta), so
time travel = pick the snapshot (by id, or newest whose timestamp-ms
<= the requested point), read its manifest list, keep manifest entries
whose status != DELETED (2), and scan the listed parquet files.

File-level partition pruning (reference: provider.rs:526-540): a
``partition_filter`` — WHERE-style ``[[col, op, literal], ...]``
predicates — skips whole manifests via the manifest list's per-field
partition summaries (lower/upper bounds), then skips individual data
files via each entry's ``partition`` struct, for identity-transform
partition fields. The same filter is re-applied to the resulting
DataFrame, so results are correct regardless of how much pruning the
metadata allowed — pruning is purely a scan-size optimization, which is
what makes a partition-filtered query on a 100 TB table plan a scan
over only its partitions' files instead of every live file.

Limitations (documented, enforced): format v1/v2 append-style tables;
positional/equality delete files are rejected loudly rather than
silently mis-read; hidden-partition TRANSFORMS (bucket/truncate/
day/...) do not participate in pruning — only identity fields do
(Spark still prunes columns/rows inside the parquet scan).
"""

from __future__ import annotations

import json
import os
import struct as _struct

from pyspark.sql import DataFrame, SparkSession

from strake_spark.config import SourceConfig
from strake_spark.errors import SourceError
from strake_spark.sources.registry import source_type

_DELETED = 2  # manifest entry status


# --------------------------------------------------------- avro via py4j
def _jrecord_to_py(obj):
    """GenericRecord / Utf8 / arrays -> plain Python, recursively."""
    if obj is None:
        return None
    cls = obj.getClass().getName() if hasattr(obj, "getClass") else None
    if cls is None:
        return obj
    if cls == "org.apache.avro.util.Utf8":
        return str(obj)
    if cls == "org.apache.avro.generic.GenericData$Record":
        out = {}
        for f in obj.getSchema().getFields():
            out[f.name()] = _jrecord_to_py(obj.get(f.name()))
        return out
    if cls in ("org.apache.avro.generic.GenericData$Array", "java.util.ArrayList"):
        return [_jrecord_to_py(x) for x in obj]
    if cls == "java.util.HashMap":
        return {str(k): _jrecord_to_py(obj.get(k)) for k in obj.keySet()}
    if cls == "java.nio.HeapByteBuffer":
        # NB: obj.get(bytearray) would fill a COPY on the JVM side —
        # py4j passes arrays by value — so read via the backing array
        jarr = obj.array()
        start = obj.arrayOffset() + obj.position()
        return bytes(jarr[start:start + obj.remaining()])
    return obj


def read_avro_records(spark: SparkSession, path: str) -> list[dict]:
    """Decode an Avro container file into dicts using the JVM's avro
    jar (driver-side; Iceberg manifests are small metadata files)."""
    jvm = spark._jvm
    try:
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
    except Exception as e:  # noqa: BLE001 - corrupt/missing file with context
        raise SourceError(f"cannot open avro file {path!r}: {e}") from e
    out = []
    try:
        while reader.hasNext():
            out.append(_jrecord_to_py(reader.next()))
    finally:
        reader.close()
    return out


# ------------------------------------------------------- table metadata
def _strip_file_uri(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def load_table_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        candidates = [
            os.path.join(meta_dir, f"v{v}.metadata.json"),
            os.path.join(meta_dir, f"{v}.metadata.json"),
        ]
        path = next((c for c in candidates if os.path.exists(c)), None)
        if path is None:
            raise SourceError(f"version-hint points at missing metadata: {v!r}")
    else:
        metas = sorted(
            f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")
        ) if os.path.isdir(meta_dir) else []
        if not metas:
            raise SourceError(f"no Iceberg metadata under {meta_dir!r}")
        path = os.path.join(meta_dir, metas[-1])
    with open(path) as f:
        meta = json.load(f)
    if meta.get("format-version") not in (1, 2):
        raise SourceError(
            f"unsupported Iceberg format-version {meta.get('format-version')!r}"
        )
    return meta


def select_snapshot(
    meta: dict,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise SourceError("Iceberg table has no snapshots")
    if snapshot_id is not None:
        for s in snaps:
            if int(s["snapshot-id"]) == int(snapshot_id):
                return s
        raise SourceError(f"snapshot {snapshot_id} not found")
    if as_of_timestamp_ms is not None:
        eligible = [
            s for s in snaps if int(s["timestamp-ms"]) <= int(as_of_timestamp_ms)
        ]
        if not eligible:
            raise SourceError(
                f"no snapshot at or before timestamp {as_of_timestamp_ms}"
            )
        return max(eligible, key=lambda s: int(s["timestamp-ms"]))
    current = meta.get("current-snapshot-id")
    for s in snaps:
        if int(s["snapshot-id"]) == int(current):
            return s
    raise SourceError(f"current snapshot {current!r} missing from snapshot list")


# ------------------------------------------------- partition pruning
_OPS = ("=", "==", "!=", "<", "<=", ">", ">=", "in")


def _normalize_filter(partition_filter) -> list[tuple[str, str, object]]:
    """Accepts ``{col: value}`` (equalities) or ``[[col, op, value],...]``
    (op from =, !=, <, <=, >, >=, in); returns triples."""
    if partition_filter is None:
        return []
    if isinstance(partition_filter, str):
        partition_filter = json.loads(partition_filter)
    if isinstance(partition_filter, dict):
        return [(c, "==", v) for c, v in partition_filter.items()]
    out = []
    for item in partition_filter:
        col, op, val = item
        if op not in _OPS:
            raise SourceError(f"unsupported partition_filter op {op!r}")
        out.append((str(col), "==" if op == "=" else op, val))
    return out


def _current_schema_fields(meta: dict) -> dict[int, tuple[str, str]]:
    """field-id -> (name, iceberg type string) from the current schema."""
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in meta["schemas"] if s.get("schema-id") == sid),
            meta["schemas"][0] if meta["schemas"] else {},
        )
    else:
        schema = meta.get("schema", {})
    out = {}
    for f in schema.get("fields", []):
        t = f.get("type")
        out[int(f["id"])] = (f["name"], t if isinstance(t, str) else "")
    return out


def _identity_partition_fields(meta: dict, spec_id: int) -> list[dict]:
    """Spec fields in order, each annotated with the source column name
    and type for identity transforms (source_name=None otherwise)."""
    if "partition-specs" in meta:
        spec = next(
            (s for s in meta["partition-specs"] if s.get("spec-id") == spec_id),
            None,
        )
        fields = (spec or {}).get("fields", [])
    else:
        fields = meta.get("partition-spec", [])
    by_id = _current_schema_fields(meta)
    out = []
    for f in fields:
        src = by_id.get(int(f.get("source-id", -1)))
        identity = str(f.get("transform", "")) == "identity"
        out.append({
            "name": f["name"],
            "source_name": src[0] if (src and identity) else None,
            "type": src[1] if src else "",
        })
    return out


def _coerce_literal(val, ice_type: str):
    """Align a filter literal with the representation partition values
    take in manifests: dates are stored as int days since epoch, so ISO
    strings convert; everything else compares as-is."""
    if ice_type == "date" and isinstance(val, str):
        import datetime

        return (datetime.date.fromisoformat(val)
                - datetime.date(1970, 1, 1)).days
    return val


def _cmp(op: str, a, b) -> bool:
    if op == "==":
        return a == b
    if op == "!=":
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    if op == "in":
        return a in b
    raise SourceError(f"unsupported op {op!r}")  # pragma: no cover


def _entry_matches(partition: dict, preds, spec_fields) -> bool:
    """False only when a predicate on an identity field definitely
    excludes every row of the file. A null partition value means the
    column is null for all rows, which no comparison predicate keeps
    (SQL WHERE discards unknown)."""
    by_source = {f["source_name"]: f for f in spec_fields if f["source_name"]}
    for col, op, val in preds:
        f = by_source.get(col)
        if f is None or f["name"] not in partition:
            continue  # not prunable by this predicate
        pv = partition[f["name"]]
        if pv is None:
            return False
        if op == "in":
            lit = [_coerce_literal(v, f["type"]) for v in val]
        else:
            lit = _coerce_literal(val, f["type"])
        try:
            if not _cmp(op, pv, lit):
                return False
        except TypeError:
            continue  # incomparable literal: keep the file
    return True


# Iceberg single-value binary serialization for bound bytes
def _decode_bound(raw: bytes | None, ice_type: str):
    if raw is None:
        return None
    try:
        if ice_type == "int" or ice_type == "date":
            return _struct.unpack("<i", raw)[0]
        if ice_type == "long" or ice_type.startswith("timestamp"):
            return _struct.unpack("<q", raw)[0]
        if ice_type == "float":
            return _struct.unpack("<f", raw)[0]
        if ice_type == "double":
            return _struct.unpack("<d", raw)[0]
        if ice_type == "string":
            return raw.decode()
    except (_struct.error, UnicodeDecodeError):
        return None
    return None  # unsupported type: no summary pruning


def _manifest_may_match(summaries, preds, spec_fields) -> bool:
    """Interval test against the manifest list's per-field partition
    summaries; True (keep) whenever bounds are absent/undecodable."""
    if not summaries:
        return True
    by_source = {}
    for i, f in enumerate(spec_fields):
        if f["source_name"] and i < len(summaries):
            by_source[f["source_name"]] = (f, summaries[i])
    for col, op, val in preds:
        hit = by_source.get(col)
        if hit is None:
            continue
        f, summ = hit
        lo = _decode_bound(summ.get("lower_bound"), f["type"])
        hi = _decode_bound(summ.get("upper_bound"), f["type"])
        if lo is None or hi is None:
            continue
        if op == "in":
            lits = [_coerce_literal(v, f["type"]) for v in val]
            try:
                if all(v < lo or v > hi for v in lits):
                    return False
            except TypeError:
                continue
        else:
            lit = _coerce_literal(val, f["type"])
            try:
                excluded = (
                    (op == "==" and (lit < lo or lit > hi))
                    or (op == "<" and lo >= lit)
                    or (op == "<=" and lo > lit)
                    or (op == ">" and hi <= lit)
                    or (op == ">=" and hi < lit)
                    or (op == "!=" and lo == hi == lit)
                )
            except TypeError:
                continue
            if excluded:
                return False
    return True


def data_files_for_snapshot(
    spark: SparkSession,
    snapshot: dict,
    meta: dict | None = None,
    partition_filter=None,
) -> list[str]:
    preds = _normalize_filter(partition_filter)
    mlist_path = _strip_file_uri(snapshot["manifest-list"])
    manifests = read_avro_records(spark, mlist_path)
    files: list[str] = []
    for m in manifests:
        # v2 manifest-list field is manifest_path; tolerate v1 spellings
        mpath = _strip_file_uri(m.get("manifest_path") or m.get("manifest-path"))
        if m.get("content", 0) not in (0, None):
            raise SourceError(
                "Iceberg DELETE manifests present - merge-on-read tables "
                "need the iceberg-spark-runtime path"
            )
        spec_fields = (
            _identity_partition_fields(meta, int(m.get("partition_spec_id", 0)))
            if (meta is not None and preds) else []
        )
        if preds and spec_fields and not _manifest_may_match(
            m.get("partitions"), preds, spec_fields
        ):
            continue  # whole manifest outside the filter: never opened
        for entry in read_avro_records(spark, mpath):
            if entry.get("status") == _DELETED:
                continue
            df_rec = entry.get("data_file") or {}
            content = df_rec.get("content", 0)
            if content not in (0, None):  # 1=position deletes, 2=equality
                raise SourceError(
                    "Iceberg delete files present - merge-on-read tables "
                    "need the iceberg-spark-runtime path"
                )
            fmt = str(df_rec.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise SourceError(f"unsupported Iceberg data file format {fmt!r}")
            if preds and spec_fields:
                part = df_rec.get("partition")
                if isinstance(part, dict) and not _entry_matches(
                    part, preds, spec_fields
                ):
                    continue
            files.append(_strip_file_uri(df_rec["file_path"]))
    return files


def read_iceberg_table(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    as_of_timestamp_ms: int | None = None,
    partition_filter=None,
) -> DataFrame:
    """Iceberg table -> DataFrame over exactly the snapshot's parquet
    files. ``partition_filter`` ([[col, op, value], ...] or {col: value})
    prunes data files via partition metadata AND is applied to the
    DataFrame, so it has plain WHERE semantics whatever the metadata
    allowed. Empty snapshot -> raises (a table with data never hits it);
    a filter that prunes everything returns an empty DataFrame with the
    table schema when file listing is non-empty pre-filter."""
    meta = load_table_metadata(table_path)
    snap = select_snapshot(meta, snapshot_id, as_of_timestamp_ms)
    files = data_files_for_snapshot(spark, snap, meta, partition_filter)
    preds = _normalize_filter(partition_filter)
    if not files:
        if preds:
            # all files pruned: empty result with the right schema
            all_files = data_files_for_snapshot(spark, snap, meta, None)
            if all_files:
                df = spark.read.parquet(*all_files).limit(0)
                return _apply_filter(df, preds)
        raise SourceError(
            f"Iceberg snapshot {snap['snapshot-id']} lists no data files"
        )
    return _apply_filter(spark.read.parquet(*files), preds)


def _apply_filter(df: DataFrame, preds) -> DataFrame:
    from pyspark.sql import functions as F

    for col, op, val in preds:
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(list(val)))
        else:
            df = df.filter({
                "==": c == F.lit(val), "!=": c != F.lit(val),
                "<": c < F.lit(val), "<=": c <= F.lit(val),
                ">": c > F.lit(val), ">=": c >= F.lit(val),
            }[op])
    return df


@source_type("iceberg_native")
def register_iceberg_native(spark: SparkSession, cfg: SourceConfig) -> list[str]:
    """Filesystem Iceberg tables (url = warehouse dir; each table's
    path is <url>/<name> or an explicit per-table path). Per-table
    options: snapshot_id, as_of_timestamp_ms (time travel),
    partition_filter ([[col, op, value], ...] — prunes data files via
    partition metadata and applies as a WHERE)."""
    from strake_spark.sources.file import view_name

    if not cfg.tables:
        raise SourceError(f"iceberg_native source {cfg.name!r} declares no tables")
    registered: list[str] = []
    for tbl in cfg.tables:
        table_path = tbl.path or os.path.join(cfg.url or "", tbl.name)
        opts = dict(tbl.options)
        snap_id = opts.get("snapshot_id")
        as_of = opts.get("as_of_timestamp_ms")
        df = read_iceberg_table(
            spark,
            table_path,
            snapshot_id=int(snap_id) if snap_id is not None else None,
            as_of_timestamp_ms=int(as_of) if as_of is not None else None,
            partition_filter=opts.get("partition_filter"),
        )
        declared = tbl.struct_type()
        if declared is not None:
            from strake_spark.sources.drift import reconcile

            df = reconcile(df, declared, context=tbl.name)
        view = view_name(cfg.name, tbl.name)
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered
