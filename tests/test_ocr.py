"""CRNN / CTC / OCR-engine tests (mechanics + trainability, no pretrained)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from manual_yolo_tpu.models import crnn  # noqa: E402
from manual_yolo_tpu.ops import ctc as ctc_ops  # noqa: E402


def test_charset_covers_reference_allowlists():
    """Every char the reference allowlists must be representable
    (yolo.py:232 card chars, :277 numerics, :305 names)."""
    for allow in (
        "AKQJT2345678910SHDCshdc",
        "0123456789.,kKmMbB$",
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_",
    ):
        for c in allow:
            assert c in crnn.CHARSET, f"missing {c!r}"


def test_crnn_forward_shapes():
    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    x = jnp.zeros((3, 32, 64, 1))
    logits = crnn.forward(params, x)
    assert logits.shape == (3, 16, crnn.NUM_CLASSES)


def test_ctc_greedy_decode_collapse():
    # hand-built logits: blank, A, A, blank, B -> "AB"
    T = 5
    ids = [0, crnn.char_to_id("A"), crnn.char_to_id("A"), 0, crnn.char_to_id("B")]
    logits = np.full((1, T, crnn.NUM_CLASSES), -10.0, np.float32)
    for t, i in enumerate(ids):
        logits[0, t, i] = 10.0
    out, conf = ctc_ops.greedy_decode(jnp.asarray(logits))
    assert ctc_ops.decode_to_text(np.asarray(out[0])) == "AB"
    assert float(conf[0]) > 0.99


def test_ctc_allowlist_masks_output():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 3, (4, 20, crnn.NUM_CLASSES)).astype(np.float32))
    mask = jnp.asarray(ctc_ops.allowlist_mask("0123456789"))
    out, _ = ctc_ops.greedy_decode(logits, mask)
    for row in np.asarray(out):
        text = ctc_ops.decode_to_text(row)
        assert all(c.isdigit() for c in text), text


def test_preprocess_gray_shapes():
    img = np.random.default_rng(0).random((17, 333)).astype(np.float32)
    out = crnn.preprocess_gray(img, 256)
    assert out.shape == (32, 256)
    tiny = np.random.default_rng(1).random((5, 3)).astype(np.float32)
    out2 = crnn.preprocess_gray(tiny, 64)
    assert out2.shape == (32, 64)


def test_render_and_roundtrip_labels():
    from manual_yolo_tpu.train.ocr import OCRTrainConfig, make_batch

    rng = np.random.default_rng(0)
    cfg = OCRTrainConfig(batch=8, width=192)
    imgs, labels, pad, texts = make_batch(rng, cfg)
    assert imgs.shape == (8, 32, 192, 1)
    for i, t in enumerate(texts):
        ids = [int(v) for v in labels[i] if v > 0]
        assert crnn.ids_to_text(ids) == t


def test_kind_gated_synthesis():
    """kinds='numeric' restricts synthesis to amount-shaped labels (used to
    train the numeric-gated high-res ensemble member)."""
    from manual_yolo_tpu.train.ocr import OCRTrainConfig, make_batch

    rng = np.random.default_rng(0)
    cfg = OCRTrainConfig(batch=16, width=192, kinds="numeric")
    assert cfg.kind_set() == frozenset({"numeric"})
    _, _, _, texts = make_batch(rng, cfg)
    # every label must be a poker amount: digits with K/M/L/BB/$/,/. framing
    allowed = set("0123456789.,$KMLB:Pot ")
    for t in texts:
        assert set(t) <= allowed, t
        assert any(c.isdigit() for c in t), t


@pytest.mark.slow
def test_crnn_overfits_tiny_set():
    """CTC training must drive loss down on a 4-sample fixed set."""
    import optax

    from manual_yolo_tpu.train.ocr import OCRTrainConfig, make_batch

    rng = np.random.default_rng(0)
    cfg = OCRTrainConfig(batch=4, width=96, max_label=12)
    imgs, labels, pad, texts = make_batch(rng, cfg)
    params = crnn.init_params(jax.random.PRNGKey(0), hidden=48)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = crnn.forward(p, jnp.asarray(imgs))
            lp = jnp.zeros(logits.shape[:2], jnp.float32)
            return jnp.mean(
                optax.ctc_loss(logits, lp, jnp.asarray(labels), jnp.asarray(pad))
            )

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for i in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_ocr_engine_batch_and_gating():
    from manual_yolo_tpu.runtime.ocr import OCREngine, field_kind

    assert field_kind("card1_rank") == "card"
    assert field_kind("villian3_stack") == "numeric"
    assert field_kind("villian2_name") == "name"
    assert field_kind("game_id") == "game_id"
    assert field_kind("iinput_field") == "numeric"

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    crop = np.random.default_rng(0).random((24, 60)).astype(np.float32)
    out = eng.read_batch([crop], "numeric", min_confidence=0.0)
    assert len(out) == 1 and isinstance(out[0][0], str)
    # random weights are low-confidence: default gate must reject
    gated = eng.read_batch([crop], "numeric", min_confidence=0.9)
    assert gated[0][0] == ""
    assert eng.read_batch([], "numeric") == []


def test_read_fields_one_device_call_per_kind():
    """read_fields must group crops by field kind: 5 mixed fields spanning
    2 kinds -> exactly 2 recognizer batches (not 5 round trips)."""
    from manual_yolo_tpu.runtime.ocr import OCREngine

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    calls = []
    orig = eng.read_batch_candidates

    def counting_read_batch(crops, kind, beam=None):
        calls.append((kind, len(crops), beam))
        return orig(crops, kind, beam=beam)

    eng.read_batch_candidates = counting_read_batch
    rng = np.random.default_rng(0)
    crops = [rng.integers(0, 255, (20, 50, 3), np.uint8) for _ in range(5)]
    names = ["my_stack", "villian1_name", "total_pot", "villian2_name", "my_bet"]
    out = eng.read_fields(crops, names)
    assert len(out) == 5
    # one GREEDY batch per kind; unreadable noise crops may additionally
    # escalate to at most one BEAM batch per kind
    greedy = sorted((k, n) for k, n, b in calls if not b)
    beam = [(k, n) for k, n, b in calls if b]
    assert greedy == [("name", 2), ("numeric", 3)]
    assert len(beam) <= 2
    # empty crops are skipped without a device call
    calls.clear()
    out = eng.read_fields([np.zeros((0, 0, 3), np.uint8), None], ["my_bet", "game_id"])
    assert out == [None, None] and calls == []


def test_engine_is_callable_as_read_field():
    from manual_yolo_tpu.runtime.ocr import OCREngine

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    crop = np.random.default_rng(0).integers(0, 255, (20, 50, 3), np.uint8)
    # callable contract used by LiveLoop/shot when read_fields is absent
    assert eng(crop, "my_stack") is None or isinstance(eng(crop, "my_stack"), str)


def test_region_fallback_triggers_on_tall_unread_crops():
    """read_fields: a tall crop the single-line read leaves empty must be
    retried through the CRAFT detect-then-read path when a text detector is
    attached (EasyOCR readtext cascade)."""
    from manual_yolo_tpu.runtime.ocr import OCREngine

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    eng._craft_fwd = object()  # sentinel: "detector attached"
    called = []

    def fake_region_field(crop, name, min_conf):
        called.append((name, crop.shape[0]))
        return "1.2K", 0.9  # (text, confidence) — read_fields_conf contract

    eng._region_field = fake_region_field
    rng = np.random.default_rng(0)
    tall = rng.integers(0, 255, (60, 80, 3), np.uint8)  # > 45 px: candidate
    short = rng.integers(0, 255, (20, 80, 3), np.uint8)  # single line: skip
    out = eng.read_fields([tall, short], ["my_bet", "my_stack"],
                          min_confidence=1.01)  # force both reads to gate out
    assert out[0] == "1.2K"
    assert called == [("my_bet", 60)]


def test_read_region_with_trained_craft_weights():
    """End-to-end detect-then-read on a rendered two-line crop; requires the
    committed CRAFT + CRNN checkpoints (skips if not trained yet)."""
    import os

    if not (os.path.exists("weights/craft_synth.npz")
            and os.path.exists("weights/crnn_real_a.npz")
            and os.path.exists("weights/crnn_real_b.npz")):
        pytest.skip("trained weights not present")
    from PIL import Image, ImageDraw, ImageFont

    from manual_yolo_tpu.runtime.ocr import OCREngine
    from manual_yolo_tpu.train.ocr import FONTS

    eng = OCREngine.from_npz("weights/crnn_real_a.npz,weights/crnn_real_b.npz",
                             text_detector="weights/craft_synth.npz")
    img = Image.new("RGB", (200, 90), (28, 28, 28))
    d = ImageDraw.Draw(img)
    font = ImageFont.truetype(FONTS[1], 22)
    d.text((12, 8), "12.5K", fill=(235, 235, 235), font=font)
    d.text((12, 50), "3400", fill=(235, 235, 235), font=font)
    bgr = np.asarray(img)[..., ::-1].copy()
    lines = eng.read_region(bgr, "numeric", min_confidence=0.1)
    texts = [t for _b, t, _c in lines]
    assert len(lines) >= 2, f"expected 2 text lines, got {lines}"
    assert any("12.5K" in t or "125K" in t for t in texts), texts
    assert any("3400" in t for t in texts), texts


def test_ensemble_of_identical_models_matches_single():
    """A K=2 ensemble of the SAME weights must read exactly like the single
    model (same candidates, deduplicated), and a mixed-seed ensemble must
    construct and read without error."""
    from manual_yolo_tpu.runtime.ocr import OCREngine

    p1 = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    p2 = crnn.init_params(jax.random.PRNGKey(5), hidden=32)
    single = OCREngine(p1, width=96)
    twin = OCREngine([p1, p1], width=96)
    mixed = OCREngine([p1, p2], width=96)
    rng = np.random.default_rng(0)
    crops = [rng.random((20, 60)).astype(np.float32) for _ in range(3)]
    for kind in ("numeric", "name"):
        a = single.read_batch_candidates(crops, kind)
        b = twin.read_batch_candidates(crops, kind)
        for ca, cb in zip(a, b):
            assert [t for t, _ in ca] == [t for t, _ in cb]
            np.testing.assert_allclose(
                [c for _, c in ca], [c for _, c in cb], atol=1e-5
            )
        m = mixed.read_batch_candidates(crops, kind)
        assert all(len(c) >= 1 for c in m)
    assert mixed._n_models == 2 and single._n_models == 1


def test_prefix_beam_matches_bruteforce_posterior():
    """Beam with full width == exact per-prefix posterior (enumerated)."""
    import itertools

    rng = np.random.default_rng(3)
    for _ in range(8):
        T, C = int(rng.integers(2, 6)), int(rng.integers(2, 5))
        logits = rng.normal(size=(T, C)) * 2
        logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
        post = {}
        for path in itertools.product(range(C), repeat=T):
            p = sum(logp[t, c] for t, c in enumerate(path))
            out, prev = [], -1
            for c in path:
                if c != ctc_ops.BLANK and c != prev:
                    out.append(c)
                prev = c
            key = tuple(out)
            post[key] = np.logaddexp(post.get(key, -np.inf), p)
        want = sorted(post.items(), key=lambda kv: -kv[1])[:3]
        got = ctc_ops.prefix_beam_decode(logp, beam_width=64, topk_chars=C)[:3]
        for (wp, ws), (gp, gs) in zip(want, got):
            assert wp == gp
            assert abs(ws - gs) < 1e-4


def test_prefix_beam_recovers_doubled_char():
    """Greedy collapses '55' when no blank frame wins argmax; the summed
    posterior prefers '55' when the inter-char frame carries enough blank
    mass. This is the dominant real-crop error class (snowsport55 ->
    snowsport5)."""
    five = crnn.char_to_id("5")
    T, C = 6, crnn.NUM_CLASSES
    # two weak boundary frames where '5' still edges out blank: greedy's
    # single path reads "5", but "55" needs only ONE of the two interior
    # frames to be blank so its summed mass dominates
    probs = [(0.9, 0.099), (0.9, 0.099), (0.51, 0.489), (0.51, 0.489),
             (0.9, 0.099), (0.9, 0.099)]
    logp = np.full((T, C), -20.0)
    for t, (pf, pb) in enumerate(probs):
        logp[t, five] = np.log(pf)
        logp[t, ctc_ops.BLANK] = np.log(pb)
    out, _ = ctc_ops.greedy_decode(jnp.asarray(logp[None], dtype=jnp.float32))
    assert ctc_ops.decode_to_text(np.asarray(out[0])) == "5"
    beams = ctc_ops.prefix_beam_decode(logp, beam_width=8)
    assert beams[0][0] == (five, five)  # posterior prefers "55"


def test_read_batch_candidates_beam_toggle():
    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    from manual_yolo_tpu.runtime.ocr import OCREngine

    eng = OCREngine(params, width=96)
    crop = np.random.default_rng(0).random((24, 60)).astype(np.float32)
    with_beam = eng.read_batch_candidates([crop], "numeric")
    eng.beam = False
    without = eng.read_batch_candidates([crop], "numeric")
    # every greedy candidate survives in the beam-augmented list
    texts_beam = {t for t, _ in with_beam[0]}
    assert {t for t, _ in without[0]} <= texts_beam | {""}


def test_multi_geometry_groups_merge_candidates(tmp_path):
    """Members with different (width, img_h) land in separate geometry
    groups (each its own device call); candidates from every group compete
    and the high-resolution member's forward runs at its own height."""
    import jax

    from manual_yolo_tpu.core.serialization import save_params
    from manual_yolo_tpu.runtime.ocr import OCREngine

    p1 = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    p2 = crnn.init_params(jax.random.PRNGKey(5), hidden=32)
    # same param TREE serves both heights: only the final pool size varies
    hi = crnn.forward(p2, jnp.zeros((1, 64, 96, 1)))
    assert hi.shape == (1, 24, crnn.NUM_CLASSES)

    a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_params(a, p1, meta={"hidden": 32, "width": 96, "img_h": 32})
    save_params(b, p2, meta={"hidden": 32, "width": 128, "img_h": 64})
    eng = OCREngine.from_npz([a, b])
    assert len(eng._groups) == 2
    assert (eng._groups[1].width, eng._groups[1].img_h) == (128, 64)

    rng = np.random.default_rng(0)
    crops = [rng.random((20, 60)).astype(np.float32) for _ in range(2)]
    reads = eng.read_batch(crops, "numeric", min_confidence=0.0)
    assert len(reads) == 2 and all(isinstance(c, float) for _, c in reads)
    cands = eng.read_batch_candidates(crops, "name")
    assert all(len(c) >= 1 for c in cands)
    # single-group engine from the same primary member: its candidate texts
    # are a subset of the two-group pool's (groups only ADD candidates)
    solo = OCREngine.from_npz([a])
    solo.beam = eng.beam = False
    s = solo.read_batch_candidates(crops, "name")
    m = eng.read_batch_candidates(crops, "name")
    for cs, cm in zip(s, m):
        assert {t for t, _ in cs} <= {t for t, _ in cm}


def test_kind_gated_group_sits_out_other_kinds(tmp_path):
    """A member whose meta carries ``kinds`` only competes for those field
    kinds: reads of other kinds must be bit-identical to an engine built
    without the gated member (the shipped h64 member is gated to
    name+game_id because its 2x lead-in truncates leading digits on short
    numeric crops)."""
    import jax

    from manual_yolo_tpu.core.serialization import save_params
    from manual_yolo_tpu.runtime.ocr import OCREngine

    p1 = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    p2 = crnn.init_params(jax.random.PRNGKey(5), hidden=32)
    a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    save_params(a, p1, meta={"hidden": 32, "width": 96, "img_h": 32})
    save_params(b, p2, meta={"hidden": 32, "width": 96, "img_h": 64,
                             "kinds": "game_id,name"})
    eng = OCREngine.from_npz([a, b])
    assert eng._groups[0].kinds is None
    assert eng._groups[1].kinds == frozenset({"game_id", "name"})
    assert len(eng._groups_for("numeric")) == 1
    assert len(eng._groups_for("name")) == 2

    rng = np.random.default_rng(1)
    crops = [rng.random((20, 60)).astype(np.float32) for _ in range(2)]
    solo = OCREngine.from_npz([a])
    solo.beam = eng.beam = False
    for kind in ("numeric", "card"):
        assert eng.read_batch_candidates(crops, kind) == \
            solo.read_batch_candidates(crops, kind)
    # gated kind: the extra member only ADDS candidates
    for cs, cm in zip(solo.read_batch_candidates(crops, "name"),
                      eng.read_batch_candidates(crops, "name")):
        assert {t for t, _ in cs} <= {t for t, _ in cm}
    # every group gated away -> fall back to all groups rather than none
    eng._groups[0].kinds = frozenset({"name"})
    assert len(eng._groups_for("numeric")) == 2


def test_run_bucketed_pads_and_chunks_consistently():
    """Bucketed execution (pad-to-power-of-2, chunk at MAX_CHUNK) must
    return exactly the per-crop results of individual calls — pad lanes
    never leak, chunk boundaries never shift results."""
    from manual_yolo_tpu.runtime.ocr import OCREngine

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    eng.MAX_CHUNK = 4  # force chunking with a small crop count
    rng = np.random.default_rng(1)
    crops = [
        rng.integers(0, 255, (20, 30 + 5 * i, 3), np.uint8).astype(np.uint8)
        for i in range(7)  # 7 -> chunks of 4 (exact) + 3 (padded to 4)
    ]
    grays = [eng._to_gray(c) for c in crops]
    batched = eng.read_batch(grays, "numeric", min_confidence=0.0)
    singles = [
        eng.read_batch([g], "numeric", min_confidence=0.0)[0] for g in grays
    ]
    for (tb, cb), (ts, cs) in zip(batched, singles):
        assert tb == ts
        assert abs(cb - cs) < 1e-5


def test_mask_stacks_share_one_shape():
    """Every kind's allowlist-mask stack is padded to the same M (the
    recognizer programs key on input shapes; per-kind M would compile one
    program per kind — cold-start wall time under the remote-compile
    tunnel, docs/BENCH_NOTES.md). masks[0] must stay the kind's primary
    (widest) mask: rescoring and confidence scoring both key off it."""
    from manual_yolo_tpu.ops import ctc as ctc_ops
    from manual_yolo_tpu.runtime.ocr import (
        NAME_ALLOW, NUMERIC_ALLOW, OCREngine,
    )

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    shapes = {k: v.shape for k, v in eng._masks.items()}
    assert len(set(shapes.values())) == 1, shapes
    np.testing.assert_array_equal(
        np.asarray(eng._masks["name"][0]),
        ctc_ops.allowlist_mask(NAME_ALLOW),
    )
    np.testing.assert_array_equal(
        np.asarray(eng._masks["numeric"][0]),
        ctc_ops.allowlist_mask(NUMERIC_ALLOW),
    )
    # padded duplicates must not change decode results vs the primary
    rng = np.random.default_rng(2)
    gray = rng.random((22, 48)).astype(np.float32)
    out = eng.read_batch([gray], "numeric", min_confidence=0.0)
    assert len(out) == 1 and isinstance(out[0][0], str)


def test_engine_prewarm_async_matches_production_programs():
    """prewarm_async must dispatch the exact (shape, mask) programs the
    read paths use: after a prewarm, real reads trigger NO new jit trace
    for the same bucket (checked via the jitted functions' cache size)."""
    from manual_yolo_tpu.runtime.ocr import OCREngine

    params = crnn.init_params(jax.random.PRNGKey(0), hidden=32)
    eng = OCREngine(params, width=96)
    eng.MIN_BUCKET = eng.MAX_CHUNK = 8
    outs = eng.prewarm_async(kinds=("numeric", "name"))
    assert outs, "prewarm dispatched nothing"
    jax.block_until_ready(outs)
    g = eng._groups[0]
    sizes_before = (g.run._cache_size(), g.run_logp._cache_size())
    rng = np.random.default_rng(3)
    grays = [rng.random((20, 40)).astype(np.float32) for _ in range(3)]
    eng.read_batch(grays, "numeric", min_confidence=0.0)
    eng.read_batch_candidates(grays, "name", beam=True)
    sizes_after = (g.run._cache_size(), g.run_logp._cache_size())
    assert sizes_after == sizes_before, (sizes_before, sizes_after)


def test_bench_route_json_line_monotone():
    """Watchdog routing: full lines always forward; provisional lines
    forward only while no full line exists AND they improve on the best
    provisional value (a colder retry must not become the driver-visible
    last line)."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "bench_for_test",
        _os.path.join(_os.path.dirname(__file__), "..", "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    full, prov = [], []
    mk = lambda v, p: f'{{"value": {v}, "provisional": {str(p).lower()}}}'
    assert bench.route_json_line(mk(10.0, True), full, prov) is True
    assert bench.route_json_line(mk(5.0, True), full, prov) is False
    assert bench.route_json_line(mk(12.0, True), full, prov) is True
    assert bench.route_json_line(mk(100.0, False), full, prov) is True
    # once a full line exists, provisional lines never forward again
    assert bench.route_json_line(mk(500.0, True), full, prov) is False
    # later full lines (median-refined) always forward
    assert bench.route_json_line(mk(90.0, False), full, prov) is True
    assert [len(full), len(prov)] == [2, 4]


def test_failure_gate_catches_catastrophic_collapse():
    """The cascade's safety property, measured not asserted (VERDICT r4
    item 3): the known catastrophic holdout misread (SolemnInflux read as
    a 2-char collapse at HIGH raw confidence) must be flagged for the
    vision-LLM tier by the calibrated failure gate — either the collapse
    detector demotes its confidence below the name gate, or the ensemble
    now reads it correctly. Runs the real shipped weights on the real
    test-split crops."""
    import os

    from manual_yolo_tpu.cli.eval_ocr import load_real_crops
    from manual_yolo_tpu.runtime.ocr import DEFAULT_RECOGNIZER_WEIGHTS, OCREngine
    from manual_yolo_tpu.runtime.shot import llm_should_escalate

    if not all(os.path.exists(w)
               for w in DEFAULT_RECOGNIZER_WEIGHTS.split(",")):
        pytest.skip("trained weights not present")
    items = [
        (c, n, t)
        for c, n, t in load_real_crops("data/ocr_real/labels.json",
                                       splits=("test",))
        if t == "SolemnInflux"
    ]
    assert items, "catastrophic-crop fixtures missing from labels.json"
    eng = OCREngine.from_npz(DEFAULT_RECOGNIZER_WEIGHTS)
    pairs = eng.read_fields_conf([c for c, _, _ in items],
                                 [n for _, n, _ in items])
    gate = OCREngine.LLM_GATE["name"]
    wrong_kept = []
    for (crop, cname, truth), (pred, conf) in zip(items, pairs):
        d = {"class_name": cname, "ocr_text": pred or "",
             "ocr_conf": round(float(conf), 3)}
        if pred != truth and not llm_should_escalate(d):
            wrong_kept.append((cname, pred, conf))
    # every WRONG read of this name must escalate; in particular the
    # known 2-char collapse reads with len_ratio ~0.24 < COLLAPSE_FLOOR,
    # so its confidence is demoted below the 0.97 name gate
    assert not wrong_kept, f"catastrophic misreads kept: {wrong_kept}"
    # and the gate is meaningfully placed (collapse demotion target 0.20
    # sits far below it)
    assert gate > 0.20


def test_collapse_detector_demotes_short_reads():
    """Unit-level: a validated read far shorter than the crop width
    supports gets its confidence demoted below every LLM gate (the
    catastrophic-collapse signature), without touching normal reads."""
    from manual_yolo_tpu.runtime.ocr import OCREngine
    from manual_yolo_tpu.runtime.shot import llm_should_escalate

    eng = OCREngine.__new__(OCREngine)  # no weights needed

    class _FakeEngine(OCREngine):
        def __init__(self):
            pass

        def read_batch_candidates(self, grays, kind, beam=None):
            return [[("ru", 0.989)] for _ in grays]

    eng = _FakeEngine()
    eng.beam = False
    eng.beam_escalate_conf = {}
    eng._craft_fwd = None
    # wide name crop (25x220 px): expected ~16 glyphs; "ru" collapses
    wide = np.full((25, 220, 3), 200, np.uint8)
    (text, conf), = eng.read_fields_conf([wide], ["villian4_name"])
    assert text == "ru"
    assert conf <= 0.20  # demoted
    assert llm_should_escalate(
        {"class_name": "villian4_name", "ocr_text": text, "ocr_conf": conf}
    )
    # narrow crop where a 2-char read is plausible: NOT demoted
    narrow = np.full((25, 40, 3), 200, np.uint8)
    (text2, conf2), = eng.read_fields_conf([narrow], ["villian4_name"])
    assert text2 == "ru" and conf2 > 0.9
