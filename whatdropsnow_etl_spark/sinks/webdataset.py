"""WebDataset-style tar shard sink and reader for binary samples.

Multimodal training loaders (WebDataset, torchdata, NVIDIA DALI)
consume corpora as numbered ``.tar`` shards whose members group by
sample key — ``000000000042.jpg`` + ``000000000042.json`` — streamed
sequentially instead of issuing one random read per sample. This
module writes that layout from a (id, payload, metadata...) DataFrame
and reads it back, closing the loop between the repo's media
operators (attach_media_payload / media_probe) and what a training
job actually mounts.

Spark-first shape: shard assignment is ``pmod(xxhash64(id, seed),
n_shards)`` — deterministic, engine-portable, and independent of
partitioning — and each shard's tar is written by ONE task via
``groupBy(shard).applyInPandas`` (group == shard exactly, unlike a
``repartition`` whose hash-of-hash can fuse or starve shards).
Members are id-sorted within the shard and the tar metadata is
pinned (mtime 0, uid/gid 0, no user names), so the SHARD BYTES are a
pure function of the data: rewriting an unchanged corpus produces
bit-identical tars (sha256-pinned in pytest) — the reproducibility
property a cached-dataset fingerprint needs. The returned manifest
relation (shard, path, n_samples, n_bytes, sha256) is the
dataset_fingerprint-style handle a loader config records.

At 100 TB: one task per shard with payloads streaming through Arrow
batches; pick n_shards so a shard is O(1-10 GB) (the WebDataset
convention); the sink never collects payloads to the driver. Paths
are plain filesystem directories here (the test env has no object
store); on cloud storage, point ``out_dir`` at a mounted bucket or
swap the ``open`` for the fsspec equivalent.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    ext: str = "bin",
    meta_cols: tuple[str, ...] = (),
    seed: int = 42,
) -> DataFrame:
    """Write ``df`` as ``shard-%05d.tar`` files under ``out_dir``;
    each sample lands as ``{id:012d}.{ext}`` plus, when ``meta_cols``
    is non-empty, a ``{id:012d}.json`` member with those columns.
    Returns the manifest DataFrame (shard, path, n_samples, n_bytes,
    sha256) — also persisted as ``manifest.json`` in ``out_dir``."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    cols = [id_col, payload_col, *meta_cols]
    shard = F.pmod(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards)
    ).alias("__shard")

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sh = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{sh:05d}.tar")
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for _, row in pdf.iterrows():
                sid = int(row[id_col])
                payload = bytes(row[payload_col])
                info = tarfile.TarInfo(name=f"{sid:012d}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(payload))
                if meta_cols:
                    meta = json.dumps(
                        {c: row[c] for c in meta_cols},
                        sort_keys=True,
                        default=str,
                    ).encode()
                    minfo = tarfile.TarInfo(name=f"{sid:012d}.json")
                    minfo.size = len(meta)
                    minfo.mtime = 0
                    minfo.uid = minfo.gid = 0
                    minfo.uname = minfo.gname = ""
                    tf.addfile(minfo, io.BytesIO(meta))
        data = buf.getvalue()
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {
                "shard": [sh],
                "path": [path],
                "n_samples": [len(pdf)],
                "n_bytes": [len(data)],
                "sha256": [hashlib.sha256(data).hexdigest()],
            }
        )

    manifest = (
        df.select(*cols, shard)
        .groupBy("__shard")
        .applyInPandas(
            write_shard,
            schema=(
                "shard bigint, path string, n_samples bigint,"
                " n_bytes bigint, sha256 string"
            ),
        )
        .collect()  # manifest is n_shards rows — model-sized by contract
    )
    rows = sorted((r.asDict() for r in manifest), key=lambda r: r["shard"])
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "shard bigint, path string, n_samples bigint, n_bytes bigint,"
        " sha256 string",
    )


def read_webdataset_shards(
    spark: SparkSession, out_dir: str, ext: str = "bin"
) -> DataFrame:
    """Read a shard directory back to (doc_id, payload, meta) — one
    row per sample, ``meta`` the raw JSON string or NULL when the
    writer had no meta_cols. Shards are listed via Spark's binaryFile
    source (so the tar BYTES distribute as ordinary splits — one task
    per shard) and untarred in an Arrow-batched map."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(out_dir, "shard-*.tar")
    )

    def untar(batches):
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for content in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    members: dict[int, dict] = {}
                    for m in tf.getmembers():
                        stem, suffix = m.name.rsplit(".", 1)
                        d = members.setdefault(int(stem), {})
                        d[suffix] = tf.extractfile(m).read()
                    for sid in sorted(members):
                        ids.append(sid)
                        payloads.append(members[sid][ext])
                        meta = members[sid].get("json")
                        metas.append(
                            meta.decode() if meta is not None else None
                        )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "meta": metas}
            )

    return files.select("content").mapInPandas(
        untar, schema="doc_id bigint, payload binary, meta string"
    )
