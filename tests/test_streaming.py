"""TopicStream / DaemonStream — checkpointed pub/sub over the index
(reference ``io/stream/TopicStream.java``, ``DaemonStream.java``)."""

import time

import pyarrow as pa
import pytest

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.deletes import add_documents
from lucene_solr_ray.stages.streaming import DaemonStream, TopicStream


@pytest.fixture()
def topic_index(ray_session, tmp_path):
    import pyarrow.parquet as pq

    texts = ["alert disk full", "normal heartbeat", "alert cpu hot",
             "normal tick", "alert net down"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}), p)
    out = str(tmp_path / "idx")
    build_index(p, out, text_col="text", id_col="doc_id",
                docs_per_segment=2)
    return out


def test_topic_pull_checkpoints(topic_index):
    t = TopicStream(topic_index, "alert")
    first = t.pull()
    assert sorted(first.column("doc_id").to_pylist()) == [0, 2, 4]
    # nothing new → empty, checkpoint stable
    assert t.pull().num_rows == 0
    assert t.checkpoint == 4

    # append new docs: only the NEW alert arrives on the next pull
    add_documents(topic_index, [5, 6],
                  ["alert quorum lost", "normal noise"])
    second = t.pull()
    assert second.column("doc_id").to_pylist() == [5]
    assert t.pull().num_rows == 0


def test_topic_batch_size_resumes(topic_index):
    t = TopicStream(topic_index, "alert")
    a = t.pull(batch_size=2)
    assert a.column("doc_id").to_pylist() == [0, 2]
    b = t.pull(batch_size=2)
    assert b.column("doc_id").to_pylist() == [4]


def test_topic_checkpoint_survives_new_instance(topic_index):
    t = TopicStream(topic_index, "alert")
    t.pull()
    # a new subscriber object with the same checkpoint file resumes
    t2 = TopicStream(topic_index, "alert")
    assert t2.pull().num_rows == 0
    add_documents(topic_index, [7], ["alert again"])
    assert t2.pull().column("doc_id").to_pylist() == [7]


def test_daemon_stream_queues_results(topic_index):
    t = TopicStream(topic_index, "alert")
    d = DaemonStream(t.pull, interval_s=0.05).start()
    try:
        deadline = time.time() + 10
        got = []
        while time.time() < deadline and not got:
            got = d.drain()
            time.sleep(0.05)
        assert got, "daemon never produced the first batch"
        assert sorted(got[0].column("doc_id").to_pylist()) == [0, 2, 4]
        # daemon keeps running but produces nothing new
        time.sleep(0.2)
        assert d.drain() == []
        add_documents(topic_index, [9], ["alert late"])
        deadline = time.time() + 10
        late = []
        while time.time() < deadline and not late:
            late = d.drain()
            time.sleep(0.05)
        assert late and late[0].column("doc_id").to_pylist() == [9]
    finally:
        d.stop()
    assert d.iterations >= 2
