"""Multi-process serving pool (serving/pool.py): broker protocol,
RemoteInference parity with the in-process service, the DB-backed
cross-worker stores, and a real 2-worker SO_REUSEPORT HTTP drive."""
import io
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from sod_tpu.serving.db import Database
from sod_tpu.serving.emailer import DbTokenStore
from sod_tpu.serving.payments import PaymentProvider
from sod_tpu.serving.pool import (
    InferenceBroker,
    RemoteInference,
    _worker_main,
)

from tests.test_serving_inference import _png, _tiny_inference


@pytest.fixture(scope="module")
def broker_env(tmp_path_factory):
    svc = _tiny_inference()
    path = str(tmp_path_factory.mktemp("brk") / "broker.sock")
    broker = InferenceBroker(svc, path)
    yield svc, path
    broker.close()


# ---------------------------------------------------------------------------
# broker + RemoteInference
# ---------------------------------------------------------------------------
def test_remote_predict_bit_exact(broker_env):
    svc, path = broker_env
    remote = RemoteInference(path)
    png = _png()
    # identical model + identical host pipeline -> byte-identical payload
    assert remote.predict(png) == svc.predict(png)
    # the refine path (bilateral solver) runs worker-side and matches too
    assert remote.predict(png, refine=True) == svc.predict(png, refine=True)


def test_remote_info_surface(broker_env):
    svc, path = broker_env
    remote = RemoteInference(path)
    assert remote.cfg.eval_image_size == svc.cfg.eval_image_size
    assert remote.mcfg.n_queries == svc.mcfg.n_queries
    assert remote.is_remote and isinstance(remote.broker_pid, int)


def test_remote_concurrent_clients(broker_env):
    svc, path = broker_env
    png = _png()
    expect = svc.predict(png)
    remote = RemoteInference(path)
    results = [None] * 8

    def worker(i):
        for _ in range(3):
            results[i] = remote.predict(png)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r == expect for r in results)


def test_broker_error_keeps_connection(broker_env):
    _, path = broker_env
    remote = RemoteInference(path)
    with pytest.raises(RuntimeError, match="unknown op"):
        remote._call("bogus", None)
    # a per-request error must not poison the persistent connection
    assert remote._call("ping", None) == "pong"


def test_remote_reconnects_after_drop(broker_env):
    svc, path = broker_env
    remote = RemoteInference(path)
    png = _png()
    assert remote.predict(png) == svc.predict(png)
    # simulate a broken pipe on every pooled connection (broker restart
    # while the sockets sat idle in the pool)
    while not remote._pool.empty():
        remote._pool.get_nowait().close()
    assert remote.predict(png) == svc.predict(png)


def test_remote_pool_reuses_connections(broker_env):
    _, path = broker_env
    remote = RemoteInference(path)
    for _ in range(5):
        assert remote._call("ping", None) == "pong"
    # sequential calls from one thread must reuse ONE pooled socket, not
    # open five (per-request churn was the round-4 advisor finding)
    assert remote._pool.qsize() == 1


def test_remote_raises_when_broker_gone(tmp_path):
    svc = _tiny_inference()
    path = str(tmp_path / "b.sock")
    broker = InferenceBroker(svc, path)
    remote = RemoteInference(path)
    broker.close()
    with pytest.raises(RuntimeError, match="broker unavailable"):
        remote.model_step(np.zeros((32, 32, 3), np.uint8))


# ---------------------------------------------------------------------------
# cross-worker DB-backed stores (two instances on one DB ~ two workers)
# ---------------------------------------------------------------------------
def test_db_token_store_cross_instance(tmp_path):
    db_path = str(tmp_path / "t.db")
    a = DbTokenStore(Database(db_path))
    b = DbTokenStore(Database(db_path))
    token = a.create_signup("n", "e@x.com", "hash", "123")
    data = b.pop_signup(token)           # verify link hits another worker
    assert data and data["email"] == "e@x.com"
    assert b.pop_signup(token) is None   # one-shot
    assert a.pop_signup(token) is None


def test_db_token_store_expiry(tmp_path):
    db = Database(str(tmp_path / "t.db"))
    store = DbTokenStore(db)
    token = store.create_signup("n", "e@x.com", "h", "")
    db.execute("UPDATE pending_signup SET expires = 0 WHERE token = %s",
               (token,))
    assert store.pop_signup(token) is None


def test_db_otp_budget_cross_instance(tmp_path):
    db_path = str(tmp_path / "t.db")
    a = DbTokenStore(Database(db_path))
    b = DbTokenStore(Database(db_path))
    otp = a.create_otp("e@x.com")
    wrong = "000000" if otp != "000000" else "000001"
    for _ in range(a.OTP_MAX_ATTEMPTS):      # guesses split across workers
        assert not (a if _ % 2 else b).verify_otp("e@x.com", wrong)
    # budget exhausted -> code burned even for the right guess
    assert not b.verify_otp("e@x.com", otp)
    # fresh code works and consume clears it everywhere
    otp2 = b.create_otp("e@x.com")
    assert a.verify_otp("e@x.com", otp2)
    a.consume_otp("e@x.com")
    assert not b.verify_otp("e@x.com", otp2)


def test_stub_payments_cross_instance(tmp_path):
    db_path = str(tmp_path / "t.db")
    a = PaymentProvider(stub_store=Database(db_path))
    b = PaymentProvider(stub_store=Database(db_path))
    s = a.create_checkout_session("basic", 7, "/ok", "/no")
    got = b.confirm(s["id"])             # redirect lands on another worker
    assert got == {"plan": "basic", "user_id": 7}
    assert a.confirm(s["id"]) is None    # one-shot across instances
    assert b.confirm("cs_stub_nope") is None


# ---------------------------------------------------------------------------
# 2-worker SO_REUSEPORT end-to-end over real HTTP
# ---------------------------------------------------------------------------
def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _multipart(field, filename, data):
    bound = "sodpoolbound42"
    body = (
        f"--{bound}\r\nContent-Disposition: form-data; "
        f'name="{field}"; filename="{filename}"\r\n'
        f"Content-Type: image/png\r\n\r\n").encode() + data + \
        f"\r\n--{bound}--\r\n".encode()
    return body, f"multipart/form-data; boundary={bound}"


def test_pool_http_end_to_end(tmp_path):
    """Full product flow against two REAL worker processes sharing one
    port, with the model served over the broker from THIS process."""
    import multiprocessing as mp

    svc = _tiny_inference()
    sock_path = str(tmp_path / "broker.sock")
    broker = InferenceBroker(svc, sock_path)
    db_path = str(tmp_path / "pool.db")
    Database(db_path)                    # create schema once up-front
    port = _free_port()
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_worker_main,
                    args=(port, sock_path, db_path,
                          str(tmp_path / "static"), "pool-secret", False, i),
                    name=f"test-worker-{i}")
        for i in range(2)
    ]
    for p in procs:
        p.start()

    base = f"http://127.0.0.1:{port}"
    jar = urllib.request.HTTPCookieProcessor()
    opener = urllib.request.build_opener(jar)

    def req(path, data=None, headers=None, timeout=30):
        r = urllib.request.Request(base + path, data=data,
                                   headers=headers or {})
        with opener.open(r, timeout=timeout) as resp:
            return json.loads(resp.read())

    try:
        # readiness: wait for BOTH workers to answer (REUSEPORT hashes
        # the 4-tuple; fresh client ports spread across them)
        pids = set()
        deadline = time.time() + 180
        while len(pids) < 2 and time.time() < deadline:
            try:
                info = req("/test_connection", timeout=5)
                pids.add(info["pid"])
                assert info["model"]["broker_pid"] == broker.info()["broker_pid"]
            except (OSError, json.JSONDecodeError):
                time.sleep(1.0)
        assert len(pids) == 2, f"saw worker pids {pids}"

        # signup on whichever worker answers; the verify link + login
        # must work on ANY worker (DB token store + signed cookies)
        r = req("/user_signup",
                data=json.dumps({"name": "u", "email": "u@x.com",
                                 "password": "p", "phone": ""}).encode(),
                headers={"Content-Type": "application/json"})
        assert "verify_url" in r
        r = req(r["verify_url"])         # sets the session cookie
        assert r.get("success")

        # a few predicts: every one must succeed regardless of worker,
        # and match the in-process service byte-for-byte
        expect = svc.predict(_png())
        served_pids = set()
        for _ in range(6):
            body, ctype = _multipart("image", "a.png", _png())
            r = req("/predict", data=body,
                    headers={"Content-Type": ctype})
            assert r["success"]
            assert r["mask"] == expect["mask"]
            assert r["objectness_scores"] == expect["objectness_scores"]
            served_pids.add(req("/test_connection")["pid"])
        assert served_pids <= pids
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=10)
        broker.close()
