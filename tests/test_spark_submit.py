"""North-rule launch mode: the engine runs via spark-submit --py-files.

End-to-end through real process boundaries: package the lib as a zip, then
build-index -> search -> eval as three separate spark-submit invocations
sharing only the filesystem (index dir, TREC run) — the same contract a
multi-executor cluster run uses, minus cluster size.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

spark_submit = shutil.which("spark-submit")
pytestmark = pytest.mark.skipif(spark_submit is None, reason="spark-submit not on PATH")


def _submit(zip_path, *args, timeout=420):
    cmd = [
        spark_submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "spark_job.py"),
        *args,
    ]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout, env=env)
    assert out.returncode == 0, f"spark-submit failed:\n{out.stderr[-4000:]}"
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1]) if lines else {}


def test_spark_submit_pipeline(tmp_path):
    # 1. package the lib for --py-files
    zip_path = str(tmp_path / "openmatch_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "spark_job.py"), "package", "--out", zip_path],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.getsize(zip_path) > 10_000

    idx = str(tmp_path / "idx")
    stats = _submit(
        zip_path, "build-index",
        "--pages", os.path.join(SF, "documents.parquet"),
        "--pages-format", "documents",
        "--index", idx, "--analyzer", "simple",
        "--num-shards", "2", "--num-term-buckets", "4",
    )
    assert stats["n_docs"] == 500
    assert os.path.exists(os.path.join(idx, "stats.json"))

    # 2. search from a fresh process against the on-disk index
    queries_tsv = str(tmp_path / "queries.tsv")
    with open(queries_tsv, "w") as f:
        f.write("q0\tspark hash join\nq1\twindow merge sort\n")
    run_path = str(tmp_path / "run.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", queries_tsv,
            "--out", run_path, "--k", "10")
    # Spark text sink writes a dir with one part file (coalesce(1))
    import glob

    parts = glob.glob(os.path.join(run_path, "part-*"))
    assert len(parts) == 1
    lines = open(parts[0]).read().strip().splitlines()
    assert 0 < len(lines) <= 20
    qid, q0, docid, rank, score, tag = lines[0].split()
    assert q0 == "Q0" and rank == "1"

    # 2a. positional sidecar from a fresh process, then phrase search over it
    info = _submit(
        zip_path, "build-positions",
        "--pages", os.path.join(SF, "documents.parquet"),
        "--pages-format", "documents", "--index", idx,
    )
    assert info["n_rows"] > 0 and info["n_positions"] >= info["n_rows"]
    phrase_path = str(tmp_path / "run_phrase.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", queries_tsv,
            "--out", phrase_path, "--k", "10", "--phrase")
    pparts = glob.glob(os.path.join(phrase_path, "part-*"))
    assert pparts  # phrase hits may be sparse; the sink must still commit

    # 2a'. Lucene-classic query_string from a fresh process (mixed clause
    # kinds: must term, phrase, exclusion, prefix)
    qs_tsv = str(tmp_path / "qs.tsv")
    with open(qs_tsv, "w") as f:
        f.write('qsA\t+spark "hash join" -window\nqsB\tsp* merge\n')
    qs_path = str(tmp_path / "run_qs.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", qs_tsv,
            "--out", qs_path, "--k", "10", "--query-string")
    qs_parts = glob.glob(os.path.join(qs_path, "part-*"))
    qs_lines = open(qs_parts[0]).read().strip().splitlines()
    assert qs_lines and all(ln.split()[1] == "Q0" for ln in qs_lines)

    # 2a''. grouped query_string grammar (parens + keywords) from a
    # fresh process — routed onto the nested-bool tree executor
    qsg_tsv = str(tmp_path / "qsg.tsv")
    with open(qsg_tsv, "w") as f:
        f.write("qsG\t(spark OR merge) AND hash\n")
    qsg_path = str(tmp_path / "run_qsg.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", qsg_tsv,
            "--out", qsg_path, "--k", "10", "--query-string")
    qsg_parts = glob.glob(os.path.join(qsg_path, "part-*"))
    qsg_lines = open(qsg_parts[0]).read().strip().splitlines()
    assert qsg_lines and all(ln.split()[0] == "qsG" for ln in qsg_lines)

    # 2b. compact the two shards into one from a fresh process; the re-run
    # search must produce byte-identical TREC output
    res = _submit(zip_path, "compact", "--index", idx)
    assert res["merged"] == [0, 1] and res["new_shard"] == 2
    run2_path = str(tmp_path / "run2.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", queries_tsv,
            "--out", run2_path, "--k", "10")
    parts2 = glob.glob(os.path.join(run2_path, "part-*"))
    assert open(parts2[0]).read() == open(parts[0]).read()

    # 3. eval from yet another process
    qrels_tsv = str(tmp_path / "qrels.tsv")
    with open(qrels_tsv, "w") as f:
        f.write(f"q0\t0\t{docid}\t1\n")
    metrics = _submit(zip_path, "eval", "--run", run_path, "--qrels", qrels_tsv, "--k", "10")
    assert metrics["mrr@10"] == 1.0


def test_spark_submit_curate_index(tmp_path):
    """curate-index subcommand end-to-end through spark-submit: gates +
    dedup + build in one launch, lineage on disk, index searchable from a
    second process."""
    zip_path = str(tmp_path / "openmatch_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "spark_job.py"), "package", "--out", zip_path],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr

    idx = str(tmp_path / "cidx")
    stats = _submit(
        zip_path, "curate-index",
        "--pages", os.path.join(SF, "documents.parquet"),
        "--pages-format", "documents",
        "--index", idx, "--analyzer", "simple",
        "--num-shards", "2", "--num-term-buckets", "4",
        "--min-quality", "0.3",
    )
    cur = stats["curation"]
    assert cur["n_pages"] == 500
    assert cur["n_kept"] == stats["n_docs"] > 0
    assert os.path.exists(os.path.join(idx, "curation"))
    assert os.path.exists(os.path.join(idx, "stats.json"))

    queries_tsv = str(tmp_path / "queries.tsv")
    with open(queries_tsv, "w") as f:
        f.write("q0\tspark hash join\n")
    run_path = str(tmp_path / "run.trec")
    _submit(zip_path, "search", "--index", idx, "--queries", queries_tsv,
            "--out", run_path, "--k", "5")
    import glob

    parts = glob.glob(os.path.join(run_path, "part-*"))
    assert parts and open(parts[0]).read().strip()


def test_spark_submit_percolate(tmp_path):
    zip_path = str(tmp_path / "openmatch_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "spark_job.py"), "package", "--out", zip_path],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    rules = str(tmp_path / "rules.tsv")
    with open(rules, "w") as f:
        f.write("r1\tspark join\t\t\nr2\t\tmerge sort\tbatch\n")
    res = _submit(
        zip_path, "percolate",
        "--pages", f"{SF}/documents.parquet", "--pages-format", "documents",
        "--rules", rules, "--out", str(tmp_path / "matches"),
    )
    assert res["matches"] > 0


def test_spark_submit_index_sort_and_synonyms(tmp_path):
    """build-index --index-sort/--synonyms -> search --sorted-by-index,
    through real process boundaries."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    zip_path = str(tmp_path / "openmatch_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "spark_job.py"), "package",
         "--out", zip_path],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr

    pages = str(tmp_path / "pages.parquet")
    rows = [
        ("doc://0", "big spark table", "en", 30.0),
        ("doc://1", "huge spark join", "en", 10.0),
        ("doc://2", "large spark merge", "en", 20.0),
        ("doc://3", "nothing here", "en", 5.0),
    ]
    pq.write_table(pa.table({
        "url": [r[0] for r in rows],
        "text": [r[1] for r in rows],
        "lang": [r[2] for r in rows],
        "price": [r[3] for r in rows],
    }), pages)

    idx = str(tmp_path / "idx")
    stats = _submit(
        zip_path, "build-index", "--pages", pages, "--index", idx,
        "--analyzer", "simple", "--num-shards", "2",
        "--num-term-buckets", "4",
        "--index-sort", "price",
        "--synonyms", "large:big,huge",
    )
    assert stats["index_sort"] == {"field": "price", "desc": False}
    assert stats["analyzer"] == "simple|syn=large:big,huge"

    queries_tsv = str(tmp_path / "q.tsv")
    with open(queries_tsv, "w") as f:
        f.write("q0\tlarge spark\n")  # 'large' hits big/huge docs via contraction
    run_path = str(tmp_path / "run.trec")
    res = _submit(zip_path, "search", "--index", idx,
                  "--queries", queries_tsv, "--out", run_path,
                  "--k", "10", "--sorted-by-index")
    assert res["mode"] == "sorted_indexed"
    part = glob.glob(os.path.join(run_path, "part-*"))[0]
    lines = [ln.split() for ln in open(part).read().splitlines()]
    # docs 0,1,2 all match (contraction); order = price ascending
    assert [ln[2] for ln in lines] == ["doc://1", "doc://2", "doc://0"]
    scores = [float(ln[4]) for ln in lines]
    assert scores == sorted(scores) == [10.0, 20.0, 30.0]
