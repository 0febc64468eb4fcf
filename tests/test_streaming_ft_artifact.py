"""Regression-pin the streaming-FT accuracy claim (VERDICT r3 item 4).

Round 3 established (NOTES.md "Streaming-consistent fine-tuning") that a
parity-trained checkpoint loses CC 0.80->0.53 when served through the
--streaming encoder, and that fine-tuning THROUGH the streaming forward
(train.py --streaming_ft) recovers most of it: streaming-vs-parity CC delta
about -0.066 with mode-agreement CC 0.99, parity mode IMPROVED. That claim
lived only in NOTES; artifacts/streamft_fixture.npz is the committed
converged checkpoint (bf16, trained on the synthetic blob fixture by
scripts/exp_streaming_trained.py + exp_streaming_ft.py, then 4 more
streaming-FT epochs at lr 1e-5 — the continuation bought delta
-0.098 -> -0.067 and agreement 0.982 -> 0.990 on the held-out video; all
on the real TPU). This test loads it and asserts the claim at reduced
geometry (one held-out video, fewer frames, strided parity scoring —
measured: parity_cc 0.793, streaming_cc 0.726, cc_delta -0.067,
agreement_cc 0.9895; bench.py's BENCH_MODE=streamft re-measures the same
numbers on TPU at fuller geometry every round, where the full-geometry
record is delta -0.070, agreement 0.989).
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "artifacts", "streamft_fixture.npz")


@pytest.mark.slow
def test_streaming_ft_artifact_accuracy():
    if not os.path.exists(ARTIFACT):
        pytest.fail(f"committed artifact missing: {ARTIFACT}")
    import jax.numpy as jnp

    from vinet_tpu.inference.accuracy import evaluate_modes, load_artifact
    from vinet_tpu.models import ViNet

    model = ViNet(num_hier=3, clip_size=32)
    params, state = load_artifact(ARTIFACT, model)
    r = evaluate_modes(model, params, state, n_frames=72, seeds=(100,),
                       dtype=jnp.float32, parity_stride=4, batch=8)

    # the checkpoint genuinely tracks the fixture in BOTH modes...
    assert r["parity_cc"] > 0.70, r
    assert r["streaming_cc"] > 0.65, r
    # ...and the NOTES claim holds: streaming within 0.08 CC of parity,
    # mode agreement >= 0.98 (round-3 measured: delta -0.066, agreement 0.991)
    assert r["cc_delta"] >= -0.08, r
    assert r["agreement_cc"] >= 0.98, r


@pytest.mark.slow
def test_streaming_ft_fixture_suite():
    """The accuracy claim must hold across DISTINCT dynamics, not one video
    (VERDICT r4 item 3). Round-5 TPU-measured per-fixture CC deltas at bf16
    (72 frames each): blob -0.070, multiblob -0.058, occlusion -0.076,
    scale -0.036, static_then_moving -0.070; agreement_min 0.98+. Bounds
    below carry margin for the f32 CPU backend and are asserted PER KIND so
    a regression in any one dynamics class fails loudly. bench.py's
    BENCH_MODE=streamft re-measures the same suite on TPU
    (cc_delta_min/cc_delta_mean/fixtures fields)."""
    if not os.path.exists(ARTIFACT):
        pytest.fail(f"committed artifact missing: {ARTIFACT}")
    import jax.numpy as jnp

    from vinet_tpu.inference.accuracy import evaluate_fixture_suite, load_artifact
    from vinet_tpu.models import ViNet

    model = ViNet(num_hier=3, clip_size=32)
    params, state = load_artifact(ARTIFACT, model)
    s = evaluate_fixture_suite(model, params, state, n_frames=72,
                               dtype=jnp.float32, batch=8)
    assert len(s["fixtures"]) == 5, s
    for row in s["fixtures"]:
        assert row["cc_delta"] >= -0.10, row
        assert row["agreement_cc"] >= 0.97, row
    assert s["cc_delta_min"] >= -0.10, s
    assert s["cc_delta_mean"] >= -0.08, s
