"""spark-submit entrypoint scripts, driven end-to-end in-process (the
CLI layer the k8s manifests invoke)."""

from __future__ import annotations

import json
import sys

from .conftest import SMOKE_SF


def test_run_export_cli(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import run_export

    out = str(tmp_path / "exp")
    run_export.main(["--input", SMOKE_SF, "--output", out])
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["exported"]["region"] == 5
    assert spark.read.json(out).count() > 0


def test_run_syncer_cli_once(spark, tmp_path):
    sys.path.insert(0, "/root/repo/jobs")
    import run_syncer

    rules = [
        {
            "syncer_name": "s1",
            "syncer_namespace": "default",
            "suspend": False,
            "mode": "push",
            "rule_group": "e2e.gkelabs.io",
            "rule_version": "v1alpha1",
            "rule_kind": "TestCRD",
            "namespaces": [],
            "sync_fields": ["spec", "status"],
            "remote_secret": "kc-1",
        },
        {
            "syncer_name": "s2",
            "suspend": False,
            "mode": "pull",
            "rule_group": "e2e.gkelabs.io",
            "rule_version": "v1alpha1",
            "rule_kind": "TestCRD",
            "namespaces": [],
            "sync_fields": ["status"],
        },
    ]
    rules_path = tmp_path / "rules.json"
    rules_path.write_text(json.dumps(rules))

    oplog_dir = tmp_path / "oplog"
    oplog_dir.mkdir()
    rows = [
        {"seq": 1, "op": "upsert", "group": "e2e.gkelabs.io", "version": "v1alpha1",
         "kind": "TestCRD", "namespace": "default", "name": "obj1",
         "labels": {}, "annotations": {},
         "spec": {"foo": "f1", "resourceID": "r1"}, "status": {"bar": "b1"}},
        {"seq": 2, "op": "upsert", "group": "other.io", "version": "v1",
         "kind": "Thing", "namespace": "default", "name": "skipme",
         "labels": {}, "annotations": {}, "spec": None, "status": None},
    ]
    (oplog_dir / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))

    run_syncer.main([
        "--rules", str(rules_path),
        "--oplog", str(oplog_dir),
        "--state", str(tmp_path / "state"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--once",
    ])
    # push syncer s1 lands in the remote destination derived from its
    # kubeconfig Secret; pull syncer s2 lands in the local destination
    # (krmsyncer_controller.go:477-487) — two different state tables
    remote = spark.read.parquet(str(tmp_path / "state" / "remote" / "default~kc-1"))
    got = remote.collect()
    assert len(got) == 1
    assert got[0]["name"] == "obj1"
    assert got[0]["spec"]["foo"] == "f1"
    assert got[0]["status"]["bar"] == "b1"
    local = spark.read.parquet(str(tmp_path / "state" / "local"))
    lgot = local.collect()
    assert len(lgot) == 1
    assert lgot[0]["name"] == "obj1"
    assert lgot[0]["spec"] is None  # s2 syncs status only
    assert lgot[0]["status"]["bar"] == "b1"


def test_run_export_cli_yaml(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import yaml

    import run_export

    out = str(tmp_path / "expy")
    run_export.main(["--input", SMOKE_SF, "--output", out, "--serialization", "yaml"])
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["exported"]["region"] == 5
    back = spark.read.json(out)
    row = back.filter("table_name = 'region'").first()
    assert row["path"].endswith(".yaml")
    obj = yaml.safe_load(row["payload"])
    assert "r_name" in obj and "r_regionkey" in obj


def test_run_pretraining_cli(spark, tmp_path, capsys):
    sys.path.insert(0, "/root/repo/jobs")
    import run_pretraining

    out = str(tmp_path / "corpus")
    run_pretraining.main(["--input", SMOKE_SF, "--output", out, "--cap", "128"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["written_docs"] == stats["input_docs"] - stats[
        "dropped_quality"
    ] - stats["dropped_duplicate"]
    assert set(stats["splits"]) <= {"train", "valid", "test"}
    assert stats["splits"]["train"]["n_docs"] > stats["splits"]["test"]["n_docs"]

    from pyspark.sql import functions as F

    corpus = spark.read.parquet(out)
    # partitioned layout readable with pruning
    assert corpus.filter(F.col("split") == "train").count() == stats["splits"][
        "train"
    ]["n_docs"]
    # no content duplicates survived
    n = corpus.count()
    assert corpus.select(F.sha2("text", 256)).distinct().count() == n
    # every surviving doc passes the quality gates (re-derive)
    toks = F.split(F.col("text"), " ")
    ntk = F.size(toks)
    assert corpus.filter(ntk < 20).count() == 0
    # packing: per (split, source), intervals are contiguous — doc i's
    # first_seq derives from the running token sum before it
    w_ok = (
        corpus.groupBy("split", "source")
        .agg(
            F.sum("n_tokens").alias("tot"),
            (F.max("last_seq") + 1).alias("nseq"),
        )
        .withColumn("expect_nseq", F.ceil(F.col("tot") / 128))
        .filter(F.col("nseq") != F.col("expect_nseq"))
    )
    assert w_ok.count() == 0, w_ok.collect()
    # split is content-hash derived: same text => same split everywhere
    assert (
        corpus.select(F.substring(F.md5("text"), 1, 1).alias("d"), "split")
        .distinct()
        .groupBy("d")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
