"""Streaming curation batch≡stream parity: the AvailableNow drain of a
multi-file landing directory must produce the same curated corpus as the
batch path (same survivor text-set — streaming dedup keeps first-arrival,
batch keeps an arbitrary member; the deduped text multiset is what's
deterministic), with state keyed on the 16-byte content hash."""

from __future__ import annotations

import duckdb

from novelti_dingo_spark.streaming.curation import run_curate_stream


def test_stream_curation_matches_batch(spark, sf_small, tmp_path):
    src = tmp_path / "landing"
    out = tmp_path / "curated"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    # split the corpus into 3 arriving files -> 3 micro-batches
    con = duckdb.connect()
    for i in range(3):
        con.sql(
            f"COPY (SELECT * FROM '{sf_small}/documents.parquet' "
            f"WHERE doc_id % 3 = {i}) TO '{src}/part{i}.parquet' (FORMAT parquet)"
        )
    run_curate_stream(spark, str(src), str(out), str(ckpt), min_quality=0.5)

    got = duckdb.sql(
        f"SELECT text, quality FROM '{out}/lang=*/*.parquet'"
    ).fetchall()
    want = duckdb.sql(
        f"""
        WITH dedup AS (
          SELECT text, min(doc_id) AS doc_id
          FROM '{sf_small}/documents.parquet' GROUP BY text
        ), d AS (
          SELECT d.text, string_split(d.text, ' ') AS toks, d.n_chars
          FROM '{sf_small}/documents.parquet' d
          JOIN dedup USING (text, doc_id)
        )
        SELECT text,
               round(least(len(toks) / 50.0, 1.0) * 0.6
                     + (1 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0
                        / len(toks)) * 0.4, 6) AS quality
        FROM d
        WHERE round(least(len(toks) / 50.0, 1.0) * 0.6
                    + (1 - len(list_filter(toks, x -> x IN ('the','a'))) * 1.0
                       / len(toks)) * 0.4, 6) >= 0.5
        """
    ).fetchall()
    assert sorted(got) == sorted(want)
    # restart from the checkpoint with no new files: exactly-once means
    # nothing is re-emitted
    n_before = len(got)
    run_curate_stream(spark, str(src), str(out), str(ckpt), min_quality=0.5)
    n_after = duckdb.sql(
        f"SELECT count(*) FROM '{out}/lang=*/*.parquet'"
    ).fetchone()[0]
    assert n_after == n_before
