"""Global performance knobs.

These are trace-time settings: changing them requires re-jitting (call sites
read them during tracing). They default to maximum-parity values; bench/
deploy configs flip them for speed.

  knn_precision: matmul precision for the pairwise-distance kNN.
    'highest'  - full f32 (6-pass on MXU). Exact parity with the reference's
                 f32 cuBLAS matmul; the default.
    'tensorfloat32' - 3-pass; ~2x faster, ~1e-5 relative error.
    'default'  - single-pass bf16 multiplies (~6x faster). Near-tie
                 neighbour flips possible (~0.4% relative distance error);
                 symmetric pooling absorbs almost all of it.
  binary_matmul: implementation of the binarized eval matmul.
    'int8'     - ±1 operands cast to int8, MXU int8×int8→int32 (the TPU-
                 native XNOR-popcount equivalent; bit-exact vs f32). Default.
    'f32'      - plain float matmul of sign() values (reference semantics,
                 slowest; useful for differential testing).
"""

from __future__ import annotations

import jax

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "tensorfloat32": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _invalidate():
    """Config knobs are trace-time globals read inside jitted functions
    (sv_round3, knn_pallas, the engines' _jit_forward, ...), so they are
    NOT part of jax's compilation cache key: flipping a knob between
    same-shape calls would silently reuse executables compiled under the
    old value. Every setter clears the jit cache to make the re-jit the
    docstring promises actually happen."""
    jax.clear_caches()

knn_precision: str = "highest"
binary_matmul: str = "int8"
knn_impl: str = "auto"  # 'auto' | 'xla' | 'pallas'
edge_gather: str = "auto"  # 'auto' | 'xla' | 'pallas'
fused_train: str = "auto"  # 'auto' | 'on' | 'off' — fused Pallas train fwd/bwd


def set_edge_gather(name: str) -> None:
    """Training-path neighbour gather: 'pallas' = MXU one-hot custom-VJP op
    (ops/pallas/edge_gather.py, ~5x XLA's gather/scatter loops on TPU);
    'auto' picks it on TPU when shapes allow."""
    global edge_gather
    assert name in ("auto", "xla", "pallas"), name
    edge_gather = name
    _invalidate()


def set_knn_impl(name: str) -> None:
    global knn_impl
    assert name in ("auto", "xla", "pallas"), name
    knn_impl = name
    _invalidate()


def set_knn_precision(name: str) -> None:
    global knn_precision
    assert name in _PRECISIONS, name
    knn_precision = name
    _invalidate()


def get_knn_precision():
    return _PRECISIONS[knn_precision]


def set_binary_matmul(name: str) -> None:
    global binary_matmul
    assert name in ("int8", "f32"), name
    binary_matmul = name
    _invalidate()


approx_fold: int = 256  # approx-mode selection fold width (sv_round3)


def set_approx_fold(width: int) -> None:
    """Approx-mode candidate fold width L (trace-time). The selection key
    array is pairwise-max folded from N down to L columns before top-k
    extraction, cutting the per-rank sweep cost ~N/L x at an expected
    ~C(k,2)/L collided top-k pairs (PERF.md recall ledger: L=256 measures
    0.997 recall on Morton-sorted surface clouds at N=1024/k=20). Raise L
    for large N*k shapes (partseg) where collisions cost more recall;
    L >= N disables the fold (approx == fast selection)."""
    global approx_fold
    assert width >= 64 and width % 2 == 0, width
    approx_fold = width
    _invalidate()


approx_gather_bits: int = 16  # approx-mode gather precision (sv_round3)


def set_approx_gather_bits(bits: int) -> None:
    """Approx-mode one-hot gather precision (trace-time): 16 (default,
    two int8 planes — the fast mode's representation, ~2^-15 absolute
    error) or 8 (ONE int8 plane, ~2^-8 absolute of the per-channel max —
    HALF the gather's MXU cost). After the selection fold, the gather is
    what binds an approx round at partseg shapes (k=40, conv4 C=127);
    centres decode through the same grid, so self-edges still cancel
    exactly. A/B on-chip and validate on a trained checkpoint before
    serving with 8."""
    global approx_gather_bits
    assert bits in (8, 16), bits
    approx_gather_bits = bits
    _invalidate()


fast_gather_bits: int = 16  # fast-mode gather precision (sv_round3)


def set_fast_gather_bits(bits: int) -> None:
    """Fast-mode one-hot gather precision (trace-time): 16 (default, two
    int8 planes, ~2^-15 absolute error of the per-channel max) or 8 (ONE
    int8 plane, ~2^-8 absolute — HALF the gather's MXU cost) — the same
    plane trade as set_approx_gather_bits but with fast's UNFOLDED
    selection, so neighbour sets keep fast-mode quality (no fold-collision
    recall loss). The gather MXU floor is the largest single wall of a
    partseg round (k=40, conv4 C=127: ~218 us/cloud at 16-bit), which is
    what this knob halves. Centres decode through the same grid, so
    self-edges still cancel exactly. Validate on a trained checkpoint
    before serving with 8."""
    global fast_gather_bits
    assert bits in (8, 16), bits
    fast_gather_bits = bits
    _invalidate()


round_block_matmul: str = "bf16"  # 'bf16' | 'int8' — in-kernel ±1 matmul


def set_round_block_matmul(name: str) -> None:
    """The fused round kernels' binarized block matmul (sign(x)·sign(w)):
    'bf16' = ±1 operands in bf16 on the MXU (production default);
    'int8' = ±1 operands as int8, int32 accumulation — 2x the MXU rate,
    value-identical (±1 products are exact in both; sums < 2^24). A/B
    on-chip before flipping the default (Mosaic's f32→s8 convert path is
    the unproven piece, not the arithmetic)."""
    global round_block_matmul
    assert name in ("bf16", "int8"), name
    round_block_matmul = name
    _invalidate()


graph_reuse: str = "none"  # 'none' | 'conv2' | 'spatial' — DGCNN graph reuse


def set_graph_reuse(name: str) -> None:
    """Serving knob: reuse one round's kNN graph for the later DGCNN rounds
    instead of recomputing it per round (trace-time; round3 engines only).

    'none'    - reference semantics: every round recomputes kNN in its own
                input feature space (the "dynamic" in Dynamic Graph CNN).
    'conv2'   - conv2 selects in feature space and conv3/conv4 reuse its
                neighbour indices: key build + selection (the VPU wall of a
                round, PERF.md) drop out of 2 of the 4 rounds.
    'spatial' - ALL conv rounds reuse the first round's xyz graph (static
                spatial graph, PointNet++-style locality): selection runs
                once per forward.

    Accuracy is checkpoint-dependent — weights trained with dynamic graphs
    see a different receptive field. Validate on a trained checkpoint
    (--test --fused --graph-reuse ...) before serving with it; exact/fast
    modes with 'none' remain the parity reference."""
    global graph_reuse
    assert name in ("none", "conv2", "spatial"), name
    graph_reuse = name
    _invalidate()


morton_entry: bool = False  # engines Morton-sort the cloud at entry


def set_morton_entry(on: bool) -> None:
    """Serving knob (trace-time; round3 engines): Morton-sort the input
    cloud at engine entry. Exact — cls pooling is permutation-invariant
    and the partseg engine un-permutes its per-point logits. Two effects:
    (1) approx-mode fold collisions become rare (the fold pairs distant
    halves; PERF.md recall table: k=40 fold-256 recall 0.992 sorted vs
    0.933 shuffled), letting serving run narrower folds; (2) the
    data-dependent exact levers (``window``, config.reuse_gather_window)
    get the spatial block locality they need regardless of caller point
    order. Costs one argsort + two takes per forward."""
    global morton_entry
    morton_entry = bool(on)
    _invalidate()


reuse_gather_window: int = 0  # 0 = off; compacted gather width (rows)


def set_reuse_gather_window(width: int) -> None:
    """Graph-reuse rounds' gather compaction width W (trace-time; round3
    engines only, composes with config.graph_reuse != 'none').

    A reuse round's neighbour ids are known BEFORE the kernel runs, so XLA
    computes which 128-row source blocks contain any of a tile's winners
    and the kernel gathers from a W-row compaction of just those blocks —
    cutting the one-hot gather's k*N*W MAC cost by N/W. Results are
    BITWISE identical to the full-width gather (excluded blocks contribute
    exact zeros to the int32 one-hot matmul); only latency is data-
    dependent: a lax.cond falls back to the full scan whenever any tile's
    winner blocks exceed W rows. On Morton-sorted surface clouds a tile's
    spatial neighbours are block-local (W = N/2 certifies at partseg
    shapes); on shuffled inputs the fallback fires and nothing is lost
    but the prepass. W must be a multiple of 128; 0 disables."""
    global reuse_gather_window
    assert width == 0 or (width >= 128 and width % 128 == 0), width
    reuse_gather_window = width
    _invalidate()


reuse_k: int = 0  # 0 = off; neighbour ranks consumed by graph-reuse rounds


def set_reuse_k(r: int) -> None:
    """Serving knob (trace-time; round3 engines, requires
    config.graph_reuse != 'none'): graph-reuse rounds consume only the
    nearest ``r`` of the k cached neighbour ranks. Winner ids are emitted
    rank-major (rank 0 = nearest), so slicing ranks [0, r) is exactly
    running those rounds at k=r on the reused graph — the max-pool sees
    the r nearest neighbours, the edge-mean averages over r edges.

    Physics: a reuse round's cost is ~75% one-hot gather (PERF.md r3.3)
    and the gather's mask-build + MXU cost are both LINEAR in the rank
    count, so r = k/2 cuts the serving composition's dominant phase
    nearly in half. Semantics: k-subsampling — the route BASELINE.md
    names as a model-semantics change. Certify on a trained checkpoint
    (--test --fused with the knob) before serving; 0 disables."""
    global reuse_k
    assert r >= 0, r
    reuse_k = r
    _invalidate()


gather_pipeline: bool = False  # software-pipeline mask build vs gather dot


def set_gather_pipeline(on: bool) -> None:
    """Round-kernel chunk loop (trace-time; sv_round3): when on, chunk
    c+1's one-hot gather masks (VPU compares) are BUILT before chunk c's
    gather dot result is consumed, giving Mosaic a window to overlap the
    mask build with the in-flight MXU dot (ROADMAP r4 #4: the measured
    serial sum says the default order does not overlap them). Outputs are
    BITWISE identical — same masks, same dots, same accumulation order;
    only instruction scheduling changes. A/B on-chip (bench.py
    --gather-pipeline) before adopting as default."""
    global gather_pipeline
    gather_pipeline = bool(on)
    _invalidate()


exact_selection: str = "update"  # 'update' | 'pair' | 'fused' | 'value'


def set_exact_selection(name: str) -> None:
    """Exact-mode top-k extraction in the round kernels: 'update' = the
    per-rank update-and-rescan loop (production default); 'pair' = the
    sorted-G (value, row)-pair tournament — same exact semantics including
    the min-row tie-break, ~G ranks per key traversal; 'fused' = the
    update loop with its per-rank ``rows == winner`` predicate REUSED as
    the gather's one-hot mask column (selection interleaves with the
    gather/block chunks; bitwise-identical outputs, one (W, T) compare
    per rank instead of two — the mask build is the second gather wall,
    PERF.md 'refined gather floor'); 'value' (r4) = single-plane VALUE
    tournament + per-rank min-row extraction with a group scatter (same
    exact semantics, half the planes of 'pair'). A/B on-chip with
    bench.py --exact-selection before flipping the default."""
    global exact_selection
    assert name in ("update", "pair", "fused", "value"), name
    exact_selection = name
    _invalidate()


train_knobs: bool = False  # TRAIN paths simulate the serving knobs


def set_train_knobs(on: bool) -> None:
    """Knob-aware (QAT-style) training (trace-time; binary SV-DGCNN train
    paths — train/fused.py and the flax models): when on, the TRAINING
    forward simulates the serving knobs currently set in config —

      * ``graph_reuse`` 'conv2'/'spatial' — later DGCNN rounds consume the
        cached round's kNN winners instead of recomputing selection, with
        the engines' exact semantics (infer.py _trunk_round3);
      * ``reuse_k`` r — reuse rounds see only the nearest r neighbour
        ranks (the rounds run at k=r);
      * ``approx_gather_bits`` 8 — each binary round's input is fake-
        quantized to the serving gather's int8 grid (pack_planes_q8_t:
        per-channel symmetric, amax over batch+points) with a straight-
        through gradient, exactly the reference's own binarization
        pattern (train with the deployment quantization in the loop,
        ref sv_layers.py:29-53) applied to the gather.

    This is how a checkpoint is FINETUNED to certify the fast serving
    composition (ACCURACY.md r4 demoted those knobs on checkpoints trained
    without them). kNN selection itself stays exact in training — the
    serving modes' fast/approx selection is certified separately. Off by
    default; --train-knobs from the CLI."""
    global train_knobs
    train_knobs = bool(on)
    _invalidate()


def set_fused_train(name: str) -> None:
    """'auto' (TPU only), 'on', or 'off' — the fused Pallas training
    forward/backward for the binary SV-DGCNN classifier (train/fused.py)."""
    global fused_train
    assert name in ("auto", "on", "off"), name
    fused_train = name
    _invalidate()
