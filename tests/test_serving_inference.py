"""Serving inference service + /predict with refine over HTTP (tiny model),
and emailer/payments edge cases."""
import io
import json
import time

import numpy as np
import pytest
from PIL import Image

from sod_tpu.config import Config
from sod_tpu.models.maskformer import MaskFormerConfig, maskformer_init
from sod_tpu.models.vit import ViTConfig
from sod_tpu.serving.app import create_app
from sod_tpu.serving.db import Database
from sod_tpu.serving.emailer import TokenStore
from sod_tpu.serving.inference import SelfMaskInference, jet_colormap
from sod_tpu.serving.payments import PLANS, PaymentProvider

from tests.test_serving import Client  # reuse the WSGI test client


def _tiny_inference():
    cfg = Config(eval_image_size=32, compute_dtype="float32",
                 use_pallas_attention=False)
    mcfg = MaskFormerConfig(
        n_queries=4, n_decoder_layers=2,
        vit=ViTConfig(patch_size=8, embed_dim=32, depth=2, n_heads=2,
                      pos_grid=4))
    params = maskformer_init(__import__("jax").random.key(0), mcfg)
    svc = SelfMaskInference(cfg=cfg, params=params, warmup=False)
    svc.mcfg = mcfg
    # rebuild forward with the tiny mcfg
    import jax
    import jax.numpy as jnp

    from sod_tpu.models.maskformer import maskformer_apply

    @jax.jit
    def forward(params, x):
        out = maskformer_apply(params, x, mcfg)
        obj = out["objectness"][:, -1, :, 0]
        best = jnp.argmax(obj, axis=-1)
        sel = jnp.take_along_axis(out["mask_pred"][:, -1],
                                  best[:, None, None, None], axis=1)[:, 0]
        return sel.astype(jnp.float32), obj.astype(jnp.float32)

    svc._forward = forward
    return svc


def _png(h=40, w=48):
    img = np.full((h, w, 3), 25, np.uint8)
    img[10:30, 12:40] = 210
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture()
def app_client(tmp_path):
    app = create_app(db=Database(":memory:"), load_model=False,
                     upload_dir=str(tmp_path / "static"),
                     secret_key="t")
    app.inference = _tiny_inference()
    c = Client(app)
    st, r = c.post("/user_signup", json_body={
        "name": "u", "email": "u@x.com", "password": "p", "phone": ""})
    c.get(r["verify_url"])
    return c


def test_predict_http_roundtrip(app_client):
    st, r = app_client.post("/predict", files={"image": ("a.png", _png())})
    assert st == 200 and r["success"]
    import base64

    mask = Image.open(io.BytesIO(base64.b64decode(r["mask"])))
    assert mask.size == (48, 40)          # original size restored
    assert len(r["objectness_scores"]) == 4


def test_predict_refine_http(app_client):
    st, r = app_client.post("/predict?refine=1",
                            files={"image": ("a.png", _png())})
    assert st == 200 and r["success"]
    assert "refined_mask" in r and "binary_mask" in r
    import base64

    binary = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r["binary_mask"]))))
    assert binary.shape == (40, 48)
    assert set(np.unique(binary)) <= {0, 255}


def test_inference_jet_colormap():
    x = np.linspace(0, 1, 11).reshape(1, 11)
    rgb = jet_colormap(x)
    assert rgb.shape == (1, 11, 3)
    assert rgb[0, 0, 2] > rgb[0, 0, 0]     # low values blue-ish
    assert rgb[0, -1, 0] > rgb[0, -1, 2]   # high values red-ish


def test_lut_heatmap_bit_identical_to_float_path():
    """The serving fast path (jet LUT on the uint8 mask + integer blend)
    must stay bit-identical to the reference-shaped float math it
    replaced (ref heatmap app.py:297-311): LUT[v] == jet(v/255) and
    (a + h) >> 1 == trunc(0.5a + 0.5h) for uint8 a, h."""
    from sod_tpu.serving.inference import _JET_LUT

    r = np.random.RandomState(0)
    mask_u8 = np.concatenate([np.arange(256, dtype=np.uint8),
                              r.randint(0, 256, 200).astype(np.uint8)])
    mask_u8 = np.tile(mask_u8, 3)[:600].reshape(20, 30)
    img = r.randint(0, 256, (20, 30, 3)).astype(np.uint8)

    heat_old = jet_colormap(mask_u8.astype(np.float32) / 255.0)
    blended_old = (0.5 * img.astype(np.float32)
                   + 0.5 * heat_old.astype(np.float32)).astype(np.uint8)
    heat_new = _JET_LUT[mask_u8]
    blended_new = ((img.astype(np.uint16) + heat_new) >> 1).astype(np.uint8)
    np.testing.assert_array_equal(heat_old, heat_new)
    np.testing.assert_array_equal(blended_old, blended_new)


# --------------------------- micro-batching ---------------------------------

def test_micro_batcher_coalesces_and_is_correct():
    """Concurrent predicts return per-image-correct results AND coalesce
    into fewer device dispatches (VERDICT r2 item 6)."""
    import threading

    svc = _tiny_inference()
    from sod_tpu.serving.inference import MicroBatcher

    calls = []
    orig_forward = svc._forward

    def counting_forward(params, x):
        calls.append(int(x.shape[0]))
        # hold the "device" busy so the co-arriving requests provably
        # coalesce — without this the assertion depends on thread timing
        # (a lone request on an idle device dispatches immediately, by
        # design)
        time.sleep(0.05)
        return orig_forward(params, x)

    svc._forward = counting_forward
    svc._batcher = MicroBatcher(svc, buckets=(1, 4, 8), max_wait_ms=30.0)
    try:
        # distinct images -> results must not get crossed between callers
        pngs, singles = [], []
        for i in range(8):
            img = np.full((40, 48, 3), 20 + 10 * i, np.uint8)
            img[5 + i:25 + i, 8:40] = 220
            pngs.append(img)
        # ground truth via direct single dispatch (no batcher)
        import jax.numpy as jnp

        from sod_tpu.data.augment import normalize, resize_pil

        for img in pngs:
            arr = normalize(np.asarray(resize_pil(
                Image.fromarray(img), (32, 32), "bilinear"), np.float32))
            m, o = orig_forward(svc.params, jnp.asarray(arr)[None])
            singles.append((np.asarray(m)[0], np.asarray(o)[0]))
        calls.clear()

        results = [None] * 8

        def worker(i):
            buf = io.BytesIO()
            Image.fromarray(pngs[i]).save(buf, format="PNG")
            results[i] = svc.predict(buf.getvalue())

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        barrier_start = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        del barrier_start
        assert all(r is not None for r in results)
        # fewer dispatches than requests => real batching happened
        assert len(calls) < 8, calls
        assert sum(calls) >= 8
        # per-image objectness matches the single-dispatch ground truth
        for i, r in enumerate(results):
            np.testing.assert_allclose(
                r["objectness_scores"], singles[i][1], atol=1e-5,
                err_msg=f"request {i} got another caller's result")
    finally:
        svc._batcher.close()


def test_micro_batcher_closed_submit_raises():
    """submit() after close() must fail fast, and requests racing close
    into the queue are failed rather than stranded (their caller thread
    would otherwise block forever)."""
    svc = _tiny_inference()
    from sod_tpu.serving.inference import MicroBatcher, _Pending

    b = MicroBatcher(svc, buckets=(1,), max_wait_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((32, 32, 3), np.uint8))
    # a pending that raced into the queue around close() gets failed too
    p = _Pending(np.zeros((32, 32, 3), np.uint8))
    b._q.put(p)
    b._fail_queued(RuntimeError("closed"))
    assert p.event.is_set() and isinstance(p.error, RuntimeError)


def test_micro_batcher_error_propagates():
    svc = _tiny_inference()
    from sod_tpu.serving.inference import MicroBatcher

    def boom(params, x):
        raise RuntimeError("device on fire")

    svc._forward = boom
    svc._batcher = MicroBatcher(svc, buckets=(1,), max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            svc._batcher.submit(np.zeros((32, 32, 3), np.float32))
    finally:
        svc._batcher.close()


# --------------------------- token / payment edges --------------------------

def test_signup_token_expiry(monkeypatch):
    store = TokenStore()
    token = store.create_signup("n", "e@x.com", "hash", "")
    store.pending_signups[token]["expires"] = time.time() - 1
    assert store.pop_signup(token) is None
    assert store.pop_signup("nonexistent") is None


def test_otp_expiry_and_consume():
    store = TokenStore()
    otp = store.create_otp("e@x.com")
    assert store.verify_otp("e@x.com", otp)
    store.otps["e@x.com"] = (otp, time.time() - 1)
    assert not store.verify_otp("e@x.com", otp)
    otp2 = store.create_otp("e@x.com")
    store.consume_otp("e@x.com")
    assert not store.verify_otp("e@x.com", otp2)


def test_otp_bruteforce_lockout():
    """A 6-digit OTP with unlimited tries is a brute-force oracle; after
    OTP_MAX_ATTEMPTS wrong guesses the code is burned."""
    store = TokenStore()
    otp = store.create_otp("e@x.com")
    wrong = "000000" if otp != "000000" else "000001"
    for _ in range(store.OTP_MAX_ATTEMPTS):
        assert not store.verify_otp("e@x.com", wrong)
    # the correct code no longer works — a fresh OTP is required
    assert not store.verify_otp("e@x.com", otp)
    otp2 = store.create_otp("e@x.com")
    assert store.verify_otp("e@x.com", otp2)   # counter reset with new code


def test_non_binary_classifier_serving_rejected():
    """SelfMaskInference must fail at construction with a clear message
    for use_binary_classifier=False — the /predict selection needs the
    objectness head (the reference app would KeyError on such a model)."""
    from sod_tpu.config import Config

    with pytest.raises(ValueError, match="use_binary_classifier"):
        SelfMaskInference(cfg=Config(use_binary_classifier=False,
                                     compute_dtype="float32"),
                          warmup=False)


def test_payment_provider_stub():
    p = PaymentProvider()
    assert p.mode == "stub"
    with pytest.raises(ValueError):
        p.create_checkout_session("gold", 1, "/ok", "/no")
    s = p.create_checkout_session("enterprise", 7, "/ok", "/no")
    confirmed = p.confirm(s["id"])
    assert confirmed == {"plan": "enterprise", "user_id": 7}
    assert p.confirm("cs_stub_unknown") is None
    assert PLANS["enterprise"]["upload_limit"] == 1500


def test_expired_subscription_blocks(app_client):
    """An Active-but-expired subscription must not grant uploads."""
    db = app_client.app.db
    db.execute(
        "INSERT INTO subscription (Plan_Type, Start_Date, End_Date, Status, "
        "Upload_Limit, Uploads_Used, Amount_Paid, Payment_Method, User_ID) "
        "VALUES ('Basic', '2020-01-01', '2020-02-01', 'Active', 100, 0, "
        "9.99, 'Stripe', 1)")
    png = _png()
    # free tier still applies (expired sub ignored): 3 uploads then 403
    for i in range(3):
        st, _ = app_client.post("/save_image_info",
                                files={"image": (f"x{i}.png", png)})
        assert st == 200
    st, r = app_client.post("/save_image_info",
                            files={"image": ("x4.png", png)})
    assert st == 403


def test_micro_batch_auto_probe_picks_per_link_regime():
    """micro_batch="auto" (VERDICT r3 weak item 5): the probe drives
    BOTH policies end-to-end (concurrent clients through direct B=1
    dispatch vs a real MicroBatcher) and must DISABLE batching on a
    slow-link profile (cost scales with uploaded bytes, so bucket
    padding makes batched groups cost more than the images they carry)
    and ENABLE it on a chip-bound profile (cost ~flat per dispatch, so
    batching divides it).  Each fake serializes on a lock — the real
    link/device is a serial resource; dispatch-level probes without the
    end-to-end drive mispicked batched through the axon tunnel where
    concurrent per-request dispatches win 126.2 vs 73.8 req/s."""
    import threading

    svc = _tiny_inference()

    def fake_forward_factory(cost_fn):
        serial = threading.Lock()       # the link/device serializes

        def fake_forward(params, x):
            b = int(x.shape[0])
            with serial:
                time.sleep(cost_fn(b))
            return (np.zeros((b, 16, 16), np.float32),
                    np.zeros((b, 4), np.float32))
        return fake_forward

    svc._prep = lambda x: x
    # slow link: per-dispatch cost proportional to uploaded (padded)
    # bytes — a bucket-8 group pays 8 images of upload however full it is
    svc._forward = fake_forward_factory(lambda b: 0.02 * b)
    assert svc._probe_micro_batch((1, 8), clients=8, per_client=2) is False
    # locally-attached chip: per-dispatch cost ~flat across batch sizes
    svc._forward = fake_forward_factory(lambda b: 0.02)
    assert svc._probe_micro_batch((1, 8), clients=8, per_client=2) is True


def test_micro_batch_auto_without_warmup_stays_per_request():
    """"auto" with warmup=False cannot probe (buckets not compiled) and
    must fall back to per-request dispatch."""
    svc = _tiny_inference()
    assert svc.cfg.micro_batch == "auto"
    assert svc._batcher is None


def test_connection_reports_model_identity(app_client):
    st, r = app_client.get("/test_connection")
    assert st == 200 and r["model_loaded"]
    m = r["model"]
    assert m["arch"] == "vit_small" and m["quantize"] == "none"
    assert m["compute_dtype"] == "float32" and m["n_queries"] == 4
    assert m["micro_batching"] is False      # warmup=False => no batcher
