"""Multi-process correctness: per-host input sharding + cross-process gather.

Spawns two real jax processes (CPU backend, jax.distributed) that each pack
their shard of the debug split (iter_batches shard_index/num_shards — the
DistributedSampler replacement) and gather their partial result dicts with
all_gather_host (the util/misc.py:88-128 pickle all-gather equivalent);
process 0 writes the merged dump. The parent asserts the dump covers EVERY
question exactly once — the failure mode VERDICT r1 flagged (a multi-host run
silently dumping 1/N of results).
"""
import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid, out_path, repo = sys.argv[1:5]
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=int(pid))
sys.path.insert(0, repo)
from graphvqa_tpu.config import BatchConfig
from graphvqa_tpu.data import GQADataset, build_scene_graph_vocab, tokenize
from graphvqa_tpu.data.vocab import build_text_vocab
from graphvqa_tpu.parallel.collectives import all_gather_host

assets = os.path.join(repo, "graphvqa_tpu", "assets", "debug")
sg_vocab = build_scene_graph_vocab()
data = json.load(open(os.path.join(assets, "debug_programs.json")))
text_vocab = build_text_vocab(data, tokenize)
ds = GQADataset(os.path.join(assets, "debug_programs.json"),
                os.path.join(assets, "debug_sceneGraphs.json"),
                text_vocab, sg_vocab)
bcfg = BatchConfig(num_graphs=2, nodes_per_graph=32, edges_per_graph=64,
                   question_len=32, program_len=16, full_answer_len=20)
mine = {}
for meta, _batch in ds.iter_batches(bcfg, shard_index=jax.process_index(),
                                    num_shards=jax.process_count()):
    for b in range(meta["real_count"]):
        qid = str(meta["question_ids"][b])
        mine[qid] = {"questionId": qid, "answer": meta["answers"][b],
                     "from_process": jax.process_index()}
gathered = all_gather_host(mine)
if jax.process_index() == 0:
    merged = {}
    for part in gathered:
        merged.update(part)
    with open(out_path, "w") as f:
        json.dump(merged, f)
print("worker", pid, "done", len(mine), flush=True)
"""


def _run_two_workers(tmp_path, worker_src, out_path, repo):
    worker = tmp_path / "worker.py"
    worker.write_text(worker_src)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coordinator, str(i), str(out_path),
         repo], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
    return outs


def test_two_process_sharded_dump(tmp_path):
    if sys.platform != "linux":
        pytest.skip("jax.distributed CPU test is linux-only here")
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    out_path = tmp_path / "merged.json"
    _run_two_workers(tmp_path, _WORKER, out_path, repo)

    merged = json.loads(out_path.read_text())
    data = json.loads((pathlib.Path(repo) / "graphvqa_tpu" / "assets"
                       / "debug" / "debug_programs.json").read_text())
    want_qids = {str(d[3]) for d in data}
    assert set(merged) == want_qids
    # both processes contributed (the epoch really was sharded)
    assert {v["from_process"] for v in merged.values()} == {0, 1}


_VALIDATE_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid, out_path, repo = sys.argv[1:5]
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=int(pid))
sys.path.insert(0, repo)
from graphvqa_tpu.config import CONFIG_FACTORY, BatchConfig
from graphvqa_tpu.data import GQADataset, build_scene_graph_vocab, tokenize
from graphvqa_tpu.data.vocab import build_text_vocab
from graphvqa_tpu.train.loop import validate

assets = os.path.join(repo, "graphvqa_tpu", "assets", "debug")
sg_vocab = build_scene_graph_vocab()
data = json.load(open(os.path.join(assets, "debug_programs.json")))
text_vocab = build_text_vocab(data, tokenize)
ds = GQADataset(os.path.join(assets, "debug_programs.json"),
                os.path.join(assets, "debug_sceneGraphs.json"),
                text_vocab, sg_vocab)
bcfg = BatchConfig(num_graphs=2, nodes_per_graph=32, edges_per_graph=64,
                   question_len=32, program_len=16, full_answer_len=20)
cfg = CONFIG_FACTORY["gat"]()
M = cfg.model.max_execution_steps

def fake_eval_step(state, batch, rng):
    # deterministic fake predictor: right iff the label is even -- per-shard
    # accuracy differs from global, which is what the sync must fix
    labels = np.asarray(batch.short_answer_label)
    B = labels.shape[0]
    sa_pred = np.where(labels % 2 == 0, labels, labels + 1).astype(np.int32)
    vec = dict(sa_pred=sa_pred, sa_score=np.zeros(B, np.float32),
               program_match=np.zeros(B * M, bool),
               program_group_match=np.zeros(B, bool),
               program_empty=np.zeros(B * M, bool))
    return vec, np.asarray(batch.programs), None

batches = ds.iter_batches(bcfg, shard_index=jax.process_index(),
                          num_shards=jax.process_count())
res = validate(fake_eval_step, None, batches, None, cfg)

# expected GLOBAL accuracy over the whole split
labels_all = np.asarray([ds[i]["short_answer_label"]
                         for i in range(len(ds))])
expected = 100.0 * float((labels_all % 2 == 0).sum()) / len(labels_all)
local = labels_all[jax.process_index()::jax.process_count()]
local_acc = 100.0 * float((local % 2 == 0).sum()) / len(local)
assert abs(res["short_answer_acc"] - expected) < 1e-6, (
    f"validate returned {res['short_answer_acc']} != global {expected} "
    f"(local would be {local_acc})")
# the test is only meaningful if local and global genuinely differ
assert abs(local_acc - expected) > 1e-6, (local_acc, expected)
print("worker", pid, "global acc", res["short_answer_acc"], flush=True)
"""


def test_two_process_validate_returns_global_metrics(tmp_path):
    """VERDICT r3 item 4: multi-process validate must return global (not
    shard-local) accuracy — AverageMeter.synchronize() over equalized
    per-shard batch counts."""
    if sys.platform != "linux":
        pytest.skip("jax.distributed CPU test is linux-only here")
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    outs = _run_two_workers(tmp_path, _VALIDATE_WORKER,
                            tmp_path / "unused.json", repo)
    for out in outs:
        assert "global acc" in out
