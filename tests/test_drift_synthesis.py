"""Pin the drift-sweep's adversarial testdata synthesis.

tools/drift_sweep.py is the round-close gate that catches cross-engine
NULL/type divergences before the driver's testdata regeneration does
(7 document-family + 3 relational finds in r7 alone). These tests pin
the synthesized shapes — a refactor that silently drops an adversarial
row or a type flip would hollow the sweep out while it kept printing
green.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def drifted(tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "drift_sweep", os.path.join(_REPO, "tools", "drift_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["drift_sweep"] = mod
    spec.loader.exec_module(mod)
    dst = str(tmp_path_factory.mktemp("driftdata"))
    mod.synthesize(SRC, dst)
    return dst


def test_documents_gain_degenerate_rows(drifted):
    src_n = pq.read_table(f"{SRC}/documents.parquet").num_rows
    t = pq.read_table(f"{drifted}/documents.parquet")
    texts = dict(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    assert t.num_rows == src_n + 6
    assert texts[999000101] is None  # NULL text
    assert texts[999000102] == ""  # empty
    assert texts[999000103].strip() == ""  # whitespace-only
    assert len(texts[999000104].split()) == 1  # 1-token
    assert len(texts[999000105].split()) == 2  # below the 3-gram window
    assert 999000113 % 10 == 3  # lands in the mojibake plant branch
    langs = dict(
        zip(t.column("doc_id").to_pylist(), t.column("lang").to_pylist())
    )
    srcs = dict(
        zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist())
    )
    assert langs[999000101] is None and srcs[999000102] is None


def test_relational_type_flips(drifted):
    orders = pq.read_schema(f"{drifted}/orders.parquet")
    assert orders.field("o_orderdate").type == pa.date32()
    li = pq.read_schema(f"{drifted}/lineitem.parquet")
    assert li.field("l_shipdate").type == pa.date32()
    assert li.field("l_linenumber").type == pa.int64()
    assert li.field("l_discount").type == pa.float32()
    cust = pq.read_schema(f"{drifted}/customer.parquet")
    assert cust.field("c_nationkey").type == pa.int64()
    nat = pq.read_schema(f"{drifted}/nation.parquet")
    assert nat.field("n_nationkey").type == pa.int64()


def test_part_gains_null_and_one_word_names(drifted):
    t = pq.read_table(f"{drifted}/part.parquet")
    names = dict(
        zip(t.column("p_partkey").to_pylist(), t.column("p_name").to_pylist())
    )
    assert names[999000201] is None
    assert " " not in names[999000202]  # one-word (ER drop-branch)
    assert t.schema.field("p_size").type == pa.int64()


def test_events_and_embeddings_adversaries_kept(drifted):
    ev = pq.read_table(f"{drifted}/events.parquet")
    assert ev.schema.field("value").type == pa.float32()
    ids = set(ev.column("event_id").to_pylist())
    assert {888000001, 888000002, 888000003} <= ids  # NULL-field rows
    em = pq.read_table(f"{drifted}/embeddings.parquet")
    assert em.schema.field("embedding").type == pa.list_(pa.float64())
    vecs = dict(
        zip(em.column("vec_id").to_pylist(), em.column("embedding").to_pylist())
    )
    assert vecs[777001] is None  # NULL array
    assert any(x is None for x in vecs[777002])  # NULL element
