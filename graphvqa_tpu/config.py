"""Single config tree for the whole framework.

The reference scatters its configuration over hard-coded constants
(reference: Constants.py:13, gqa_dataset_entry.py:387, pipeline_model_gat.py:640,718)
and per-driver argparse blocks (mainExplain_gat.py:59-122). Here everything is one
dataclass tree so model variants / training runs / parallel layouts are declarative.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TextConfig:
    """Shared text-side vocabulary/embedding config.

    One vocab serves question, program, and full answer (reference:
    gqa_dataset_entry.py:390-398, single class-level TEXT field).
    """
    vocab_size: int = 2933          # resolved at runtime from the vocab artifact
    emb_dim: int = 300              # GloVe-300d (pipeline_model_gat.py:630)
    pad_idx: int = 1                # torchtext special order: <unk>=0 <pad>=1 <start>=2 <end>=3
    unk_idx: int = 0
    sos_idx: int = 2
    eos_idx: int = 3


@dataclasses.dataclass(frozen=True)
class SceneGraphConfig:
    """Scene-graph-side vocab / tokenisation config (reference: gqa_dataset_entry.py:53-163)."""
    vocab_size: int = 2075          # resolved at runtime from the vocab artifact
    emb_dim: int = 300              # 300d glove (pipeline_model_gat.py:560)
    pad_idx: int = 1
    max_obj_tokens: int = 12        # 1 name + up to 11 attrs (gqa_dataset_entry.py:268)
    max_edge_tokens: int = 1        # relation name is a single token (gqa_dataset_entry.py:296)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Question encoder / program decoder / full-answer decoder stack shape.

    Reference: pipeline_model_gat.py:640-663 (ninp=512, nhead=8, nhid=2048, nlayers=3).
    """
    hidden_dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    num_layers: int = 3
    dropout: float = 0.1
    max_len: int = 80               # positional table size; question<=30, program<=16


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Language-conditioned message-passing engine config.

    Reference GAT: gat_skip.py:220-236 + pipeline_model_gat.py:683-687
    (5 rounds, 4 heads, mean over heads, skip connections, BN between rounds).
    """
    kind: str = "gat"               # gat | gcn | gine | lcgn | none(onlysg)
    num_rounds: int = 5             # == MAX_EXECUTION_STEP (gqa_dataset_entry.py:387)
    heads: int = 4
    negative_slope: float = 0.2
    dropout: float = 0.1
    # LCGN-only knobs (reference: lcgn.py:255-256)
    lcgn_iters: int = 4
    lcgn_heads: int = 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    text: TextConfig = dataclasses.field(default_factory=TextConfig)
    scene: SceneGraphConfig = dataclasses.field(default_factory=SceneGraphConfig)
    transformer: TransformerConfig = dataclasses.field(default_factory=TransformerConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    num_answers: int = 1842         # short-answer classes (pipeline_model_gat.py:718)
    max_execution_steps: int = 5    # M instruction vectors (gqa_dataset_entry.py:387)
    program_decode_len: int = 16    # greedy program decode len (pipeline_model_gat.py:416)
    full_answer_decode_len: int = 20  # greedy full-answer decode len (pipeline_model_gat.py:502)
    classifier_hidden: int = 512    # out_classifier_dim (pipeline_model_gat.py:721)
    classifier_dropout: float = 0.2
    use_execution_engine: bool = False  # C17 — built, optionally enabled
    use_full_answer: bool = True
    # Compute dtype for transformer/engine matmuls (params + optimizer state
    # stay float32). SHIPPING DEFAULT: bfloat16 — the measured-fastest engine
    # (BENCH_r03: 13.5x vs the naive baseline, ROOFLINE.md), with accuracy
    # demonstrated end to end by the golden CLI test (train -> checkpoint ->
    # resume -> greedy evaluate -> official scorer at 100%,
    # tests/test_golden_overfit.py[bfloat16]) and bounded per-layer by the
    # torch parity suite. Pass --dtype float32 to the trainer CLI to opt out.
    dtype: str = "bfloat16"

    def replace_engine(self, kind: str) -> "ModelConfig":
        return dataclasses.replace(self, engine=dataclasses.replace(self.engine, kind=kind))


@dataclasses.dataclass(frozen=True)
class BatchConfig:
    """Static padded-shape config for one graph batch bucket.

    The ragged PyG Batch (gqa_dataset_entry.py:654) becomes fixed (num_graphs,
    nodes_pad, edges_pad) buckets so every jit trace has static shapes.
    """
    num_graphs: int = 32
    nodes_pad: int = 1024           # total nodes across the batch, padded (flat layout)
    edges_pad: int = 4096           # total edges across the batch, dst-sorted + padded
    question_len: int = 32
    program_len: int = 16
    full_answer_len: int = 20
    # Aggregation layout:
    #   dense   — uniform per-graph node padding, batched MXU matmuls
    #             (core/packing.py:pack_graphs_dense + ops/dense.py); the
    #             production path. Falls back to flat for a batch whose
    #             largest graph exceeds nodes_per_graph.
    #   flat    — dst-sorted edge list + XLA segment ops (the oracle path)
    layout: str = "dense"
    nodes_per_graph: int = 64
    edges_per_graph: int = 256


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. data axis == DDP replacement; edge axis = graph-domain
    context parallelism (edge-partitioned message passing, SURVEY.md §5)."""
    data: int = 1
    edge: int = 1
    axis_names: Tuple[str, str] = ("data", "edge")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference trainer flags (mainExplain_gat.py:59-122)."""
    lr: float = 1e-4
    lr_drop: int = 90               # StepLR step size (mainExplain_gat.py:287)
    lr_gamma: float = 0.1
    epochs: int = 200
    batch_size: int = 200
    weight_decay: float = 0.0
    seed: int = 1234
    print_freq: int = 100
    validate_every: int = 5
    output_dir: str = "./outputdir"
    # loss composition: the GAT driver trains short-answer only
    # (mainExplain_gat.py:542); baselines add program loss (mainExplain_gcn.py:540)
    use_program_loss: bool = False
    use_full_answer_loss: bool = False
    use_bitmap_loss: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    batch: BatchConfig = dataclasses.field(default_factory=BatchConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def gat_config() -> Config:
    return Config()


def gcn_config() -> Config:
    c = Config()
    return dataclasses.replace(
        c,
        model=c.model.replace_engine("gcn"),
        train=dataclasses.replace(c.train, use_program_loss=True),
    )


def gine_config() -> Config:
    c = Config()
    return dataclasses.replace(
        c,
        model=c.model.replace_engine("gine"),
        train=dataclasses.replace(c.train, use_program_loss=True),
    )


def lcgn_config() -> Config:
    c = Config()
    return dataclasses.replace(
        c,
        model=c.model.replace_engine("lcgn"),
        train=dataclasses.replace(c.train, use_program_loss=True),
    )


def onlysg_config() -> Config:
    c = Config()
    return dataclasses.replace(c, model=c.model.replace_engine("none"))


CONFIG_FACTORY = {
    "gat": gat_config,
    "gcn": gcn_config,
    "gine": gine_config,
    "lcgn": lcgn_config,
    "onlysg": onlysg_config,
}
