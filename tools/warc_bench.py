"""WARC ingest throughput at scale (round-4 S12 evidence).

Generates a segmented Common-Crawl-style WARC corpus (N docs spread
over S per-record-gzip segment files — Common Crawl's own layout, one
gzip member per record), then times the full ingest path:
read_warc (path-distributed streaming parse) -> warc_documents
(curation gate, persisted so the extract pass reads the cache instead
of re-parsing) -> with_extracted_text (the pipeline's s1 extraction),
requiring BYTE-IDENTICAL extraction vs the generator's regenerated
ground truth (rows_extracted_exact must equal n_docs — the input-hint
per-row invariant).

Segment GENERATION is also distributed (one task writes one segment via
the same writer the tests pin), so the tool scales to millions of docs.

Usage: python tools/warc_bench.py [N_DOCS] [CORES] [N_SEGMENTS]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_segments = int(sys.argv[3]) if len(sys.argv) > 3 else max(cores, n_docs // 25_000)

    from pyspark.sql import functions as F

    from entity_linking_spark.session import get_spark
    from entity_linking_spark.sources import warc

    spark = get_spark("warc-bench", cores=cores)
    workdir = tempfile.mkdtemp(prefix="warc_bench_")
    per_seg = (n_docs + n_segments - 1) // n_segments

    def write_segment(seg_rows):
        # one task = one segment file; synthesis mirrors schema.make_html
        from entity_linking_spark.schema import make_html
        from entity_linking_spark.sources import warc as w

        for (seg,) in seg_rows:
            lo = seg * per_seg
            recs = []
            for i in range(lo, min(lo + per_seg, n_docs)):
                url = f"https://bench.example/{i:08d}"
                words = " ".join(
                    f"w{(i * 31 + j * 7) % 997}" for j in range(40 + i % 60)
                )
                recs.append(
                    {
                        "url": url,
                        "date": f"2026-01-{1 + i % 28:02d}T00:00:00Z",
                        "http_headers": b"HTTP/1.1 200 OK\r\nContent-Type: text/html",
                        "body": make_html(words, url),
                    }
                )
            w.write_warc_file(
                os.path.join(workdir, f"seg-{seg:05d}.warc.gz"), recs
            )
            yield (seg, len(recs))

    t0 = time.time()
    gen = (
        spark.sparkContext.parallelize(
            [(s,) for s in range(n_segments)], n_segments
        )
        .mapPartitions(write_segment)
        .collect()
    )
    gen_s = time.time() - t0
    total_bytes = sum(
        os.path.getsize(os.path.join(workdir, f)) for f in os.listdir(workdir)
    )

    raw = warc.read_warc(spark, workdir)
    docs = warc.warc_documents(raw).persist()
    t0 = time.time()
    ingested = docs.count()  # one full parse; later passes read the cache
    ingest_s = time.time() - t0

    t0 = time.time()
    from entity_linking_spark.operators.extract import with_extracted_text

    ext = with_extracted_text(docs)
    # ground truth replay: regenerate the synthesized words from the doc
    # index in the url and require BYTE-IDENTICAL extraction (the
    # input-hint per-row invariant) — a nonempty-only check would pass a
    # garbling extractor
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def expected_text(url: pd.Series) -> pd.Series:
        def words(u: str) -> str:
            i = int(u.rsplit("/", 1)[1])
            return " ".join(
                f"w{(i * 31 + j * 7) % 997}" for j in range(40 + i % 60)
            )

        return url.map(words)

    n_ok = ext.where(
        F.col("text_extracted") == expected_text(F.col("url"))
    ).count()
    extract_s = time.time() - t0

    errors = raw.where(F.col("parse_error").isNotNull()).count()

    # egress: the distributed sink back to per-record-gzip segments
    t0 = time.time()
    egress_dir = os.path.join(workdir, "_egress")
    manifest = warc.write_warc(docs, egress_dir, n_segments=n_segments).collect()
    egress_s = time.time() - t0
    egress_rows = sum(r.n_records for r in manifest)
    docs.unpersist()
    shutil.rmtree(workdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "warc_ingest",
                "n_docs": n_docs,
                "n_segments": n_segments,
                "cores": cores,
                "gen_seconds": round(gen_s, 2),
                "warc_bytes": total_bytes,
                "ingest_seconds": round(ingest_s, 2),
                "ingest_docs_per_sec": round(ingested / ingest_s, 1),
                "ingest_mb_per_sec": round(total_bytes / 1e6 / ingest_s, 1),
                "ingest_plus_extract_seconds": round(ingest_s + extract_s, 2),
                "rows_ingested": ingested,
                "rows_extracted_exact": n_ok,
                "parse_errors": errors,
                "egress_seconds": round(egress_s, 2),
                "egress_docs_per_sec": round(egress_rows / egress_s, 1),
                "egress_rows": egress_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
