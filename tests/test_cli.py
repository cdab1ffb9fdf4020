"""CLI surface (reference src/main.rs parity): insert / insert-from-files
/ query / clear driven through the argparse entry point, plus binary
ingestion through the binaryFile source, plus approx-agg sanity."""

from __future__ import annotations

import pytest


def _run(argv):
    from zebra_spark.cli import main

    return main(argv)


@pytest.fixture()
def db_path(tmp_path):
    return str(tmp_path / "clidb")


def test_text_insert_query_clear(spark, db_path, capsys):
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "insert", "red fox jumps", "blue whale sings"]) == 0
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "query", "red fox", "--k", "1"]) == 0
    out = capsys.readouterr().out
    assert "red fox jumps" in out
    assert _run(["--database-path", db_path, "--cpus", "8", "text", "clear"]) == 0


def test_insert_from_text_files(spark, db_path, tmp_path):
    files = []
    for i, body in enumerate(["alpha beta gamma", "delta epsilon zeta"]):
        f = tmp_path / f"doc{i}.txt"
        f.write_text(body)
        files.append(str(f))
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "insert-from-files", *files]) == 0
    from zebra_spark.database import ZebraDatabase

    db = ZebraDatabase.open(spark, db_path)
    docs = {r.doc.strip() for r in db.documents().collect()}
    assert docs == {"alpha beta gamma", "delta epsilon zeta"}


def test_insert_from_binary_files(spark, db_path, tmp_path):
    files = []
    for i in range(3):
        f = tmp_path / f"img{i}.bin"
        f.write_bytes(bytes([i]) * 2048)
        files.append(str(f))
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "insert-from-files", *files]) == 0
    from zebra_spark.database import ZebraDatabase

    db = ZebraDatabase.open(spark, db_path)
    assert db.count() == 3
    assert {r.modality for r in db.documents().collect()} == {"image"}


def test_binary_insert_then_query(spark, db_path, tmp_path, capsys):
    files = []
    for i in range(4):
        f = tmp_path / f"img{i}.bin"
        f.write_bytes(bytes([65 + i]) * 4096)
        files.append(str(f))
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "insert-from-files", *files]) == 0
    # query with the exact bytes of img2 -> it must be the top hit (dist 0)
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "query", files[2], "--k", "1"]) == 0
    out = capsys.readouterr().out
    assert "#1 dist=0.0000" in out


def test_approx_agg_sane(spark):
    import zebra_spark

    zebra_spark.load_all_queries()
    from tests.conftest import SF_ORACLE

    approx = (
        zebra_spark.QUERIES["q_agg_approx"](spark, SF_ORACLE)
        .toPandas()
        .set_index("l_returnflag")
    )
    exact = (
        zebra_spark.QUERIES["q_agg_distinct"](spark, SF_ORACLE)
        .toPandas()
        .set_index("l_returnflag")
    )
    for flag in exact.index:
        a, e = approx.loc[flag, "approx_orders"], exact.loc[flag, "n_orders"]
        assert abs(a - e) / e < 0.1, (flag, a, e)


def test_index_flag_records_family(spark, tmp_path, capsys):
    """--index picks the ANN family at creation (VERDICT r7 #4): the
    metadata records it, query serves through that family, and a later
    open ignores a conflicting flag (the database's own metadata
    wins)."""
    import json

    path = str(tmp_path / "ivfdb")
    assert _run(["--database-path", path, "--cpus", "8", "--index", "ivf",
                 "text", "insert", "red fox jumps", "blue whale sings",
                 "green turtle swims"]) == 0
    with open(f"{path}/zebra.json") as f:
        assert json.load(f)["index_kind"] == "ivf"
    # query through the IVF family; a conflicting --index is ignored on open
    assert _run(["--database-path", path, "--cpus", "8", "--index", "pq",
                 "text", "query", "red fox", "--k", "1"]) == 0
    out = capsys.readouterr().out
    assert "red fox jumps" in out
    with open(f"{path}/zebra.json") as f:
        assert json.load(f)["index_kind"] == "ivf"


def test_text_label_prop_lifecycle(spark, db_path, capsys):
    """r14 (VERDICT r13 #1): the label-prop verb drives the full
    semi-supervised lifecycle — bootstrap with label=text seeds,
    propagate-only after new inserts (backlog delta), --add seed
    growth (invalidate + re-vote) — printing the per-label histogram."""
    fruit = ["apple banana cherry", "mango papaya banana", "plum apple basket"]
    beast = ["wolf bear lynx", "otter badger bear", "moose wolf tundra"]
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "insert", *fruit, *beast]) == 0
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "label-prop", "--weighted",
                 "fruit=apple banana mango", "beast=wolf bear otter"]) == 0
    out = capsys.readouterr().out
    assert "label 'fruit'" in out and "label 'beast'" in out
    assert f"labeled {len(fruit) + len(beast)} documents" in out

    # propagate-only after an insert: the backlog (1 doc) gets labeled
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "insert", "papaya lemon bowl"]) == 0
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "label-prop", "--weighted"]) == 0
    out = capsys.readouterr().out
    assert f"labeled {len(fruit) + len(beast) + 1} documents" in out

    # --add grows the seed set (invalidate + full re-vote)
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "label-prop", "--weighted", "--add",
                 "bird=heron finch crow"]) == 0
    out = capsys.readouterr().out
    assert f"labeled {len(fruit) + len(beast) + 1} documents" in out

    # malformed seed item fails loudly
    with pytest.raises(SystemExit):
        _run(["--database-path", db_path, "--cpus", "8",
              "text", "label-prop", "no-separator-here"])


def test_binary_label_prop(spark, db_path, tmp_path, capsys):
    """The label-prop verb's binary path: seed examples are file paths
    decoded+embedded through the multimodal path (the query_blobs
    shape), then the same facade lifecycle as text."""
    files = []
    for i in range(4):
        f = tmp_path / f"img{i}.bin"
        f.write_bytes(bytes([i]) * 2048)
        files.append(str(f))
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "insert-from-files", *files]) == 0
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "label-prop", "--weighted",
                 f"dark={files[0]}", f"light={files[3]}"]) == 0
    out = capsys.readouterr().out
    assert "labeled 4 documents" in out


def test_binary_label_prop_undecodable_seed(spark, db_path, tmp_path,
                                            monkeypatch):
    """ADVICE r14: a seed blob the decoder drops must raise a usable
    SystemExit naming the file(s), not a bare KeyError on got[i]."""
    files = []
    for i in range(3):
        f = tmp_path / f"img{i}.bin"
        f.write_bytes(bytes([i]) * 2048)
        files.append(str(f))
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "image", "insert-from-files", *files]) == 0

    import zebra_spark.multimodal as mm

    real = mm.decode_and_embed

    def dropping(df, dim=mm.EMBED_DIM, decoder=None):
        # simulate a decoder that silently drops one blob (the real-PIL
        # failure shape): everything but id 1 comes back
        return real(df, dim=dim, decoder=decoder).filter("id != 1")

    monkeypatch.setattr(mm, "decode_and_embed", dropping)
    with pytest.raises(SystemExit, match="img1.bin"):
        _run(["--database-path", db_path, "--cpus", "8",
              "image", "label-prop", "--weighted",
              f"dark={files[0]}", f"mid={files[1]}", f"light={files[2]}"])


def test_audit_verb(spark, db_path, tmp_path, capsys):
    """r15 (VERDICT r14 #2): the audit verb prints every maintenance
    gate — n/a for state this database doesn't carry, live booleans
    for state it does."""
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "insert", "red fox jumps", "blue whale sings"]) == 0
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "audit"]) == 0
    out = capsys.readouterr().out
    assert "gate blocking_needs_reseed: n/a" in out
    assert "gate export_needs_rebalance: n/a" in out
    assert "gate index_needs_retrain: n/a" in out

    # a missing export tree is trivially balanced -> a live False
    assert _run(["--database-path", db_path, "--cpus", "8",
                 "text", "audit", "--export-dir",
                 str(tmp_path / "nowhere")]) == 0
    out = capsys.readouterr().out
    assert "gate export_needs_rebalance: False" in out

    # a PQ database surfaces the retrain gate — n/a until codebooks
    # exist (the audit never trains as a side effect, ADVICE r15),
    # then a live boolean once an index is persisted
    pq_path = str(tmp_path / "pqcli")
    assert _run(["--database-path", pq_path, "--cpus", "8",
                 "--index", "pq", "text", "insert",
                 "alpha beta gamma", "delta epsilon zeta"]) == 0
    assert _run(["--database-path", pq_path, "--cpus", "8",
                 "text", "audit"]) == 0
    out = capsys.readouterr().out
    assert "gate index_needs_retrain: n/a" in out

    from zebra_spark.database import ZebraDatabase

    ZebraDatabase.open(spark, pq_path).save_index()
    assert _run(["--database-path", pq_path, "--cpus", "8",
                 "text", "audit"]) == 0
    out = capsys.readouterr().out
    assert "gate index_needs_retrain: False" in out
