"""Serving layer: full product flows over the WSGI app (ref app.py routes)."""
import io
import json

import numpy as np
import pytest
from PIL import Image

from sod_tpu.serving.app import create_app
from sod_tpu.serving.db import Database, check_password, hash_password


class Client:
    """Minimal WSGI test client with cookie persistence."""

    def __init__(self, app):
        self.app = app
        self.cookies = {}
        self.last_set_cookie = None     # raw header, attribute assertions

    def request(self, method, path, json_body=None, files=None, form=None,
                headers=None):
        body = b""
        ctype = ""
        if json_body is not None:
            body = json.dumps(json_body).encode()
            ctype = "application/json"
        elif files or form:
            boundary = "testboundary123"
            parts = []
            for k, v in (form or {}).items():
                parts.append(
                    f"--{boundary}\r\nContent-Disposition: form-data; "
                    f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
            for k, (fn, data) in (files or {}).items():
                parts.append(
                    f"--{boundary}\r\nContent-Disposition: form-data; "
                    f"name=\"{k}\"; filename=\"{fn}\"\r\n"
                    f"Content-Type: application/octet-stream\r\n\r\n".encode()
                    + data + b"\r\n")
            parts.append(f"--{boundary}--\r\n".encode())
            body = b"".join(parts)
            ctype = f"multipart/form-data; boundary={boundary}"

        path_only, _, query = path.partition("?")
        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path_only,
            "QUERY_STRING": query,
            "CONTENT_TYPE": ctype,
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
            "HTTP_COOKIE": "; ".join(f"{k}={v}"
                                     for k, v in self.cookies.items()),
            "REMOTE_ADDR": "127.0.0.1",
        }
        for k, v in (headers or {}).items():
            environ["HTTP_" + k.upper().replace("-", "_")] = v
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = headers
            for k, v in headers:
                if k == "Set-Cookie":
                    self.last_set_cookie = v
                    name, _, rest = v.partition("=")
                    self.cookies[name] = rest.split(";")[0]

        chunks = self.app(environ, start_response)
        raw = b"".join(chunks)
        try:
            data = json.loads(raw)
        except Exception:
            data = raw
        return captured["status"], data

    def get(self, path, **kw):
        return self.request("GET", path, **kw)

    def post(self, path, **kw):
        return self.request("POST", path, **kw)


@pytest.fixture()
def client(tmp_path):
    app = create_app(db=Database(":memory:"), load_model=False,
                     upload_dir=str(tmp_path / "static"),
                     secret_key="test-secret", allow_default_admin=True)
    return Client(app)


def _signup_and_login(client, email="u@example.com"):
    st, r = client.post("/user_signup", json_body={
        "name": "Test User", "email": email, "password": "pw123",
        "phone": "123"})
    assert st == 200 and r["success"]
    st, r = client.get(r["verify_url"])
    assert st == 200 and r["success"]
    return r["user_id"]


def test_signup_verify_login_flow(client):
    uid = _signup_and_login(client)
    assert uid == 1
    # fresh client: log in with the password
    c2 = Client(client.app)
    st, r = c2.post("/user_login", json_body={"email": "u@example.com",
                                              "password": "pw123"})
    assert st == 200 and r["success"]
    st, r = c2.post("/user_login", json_body={"email": "u@example.com",
                                              "password": "wrong"})
    assert st == 401


def test_signup_duplicate_email(client):
    _signup_and_login(client)
    st, r = client.post("/user_signup", json_body={
        "name": "x", "email": "u@example.com", "password": "pw"})
    assert st == 400


def test_predict_requires_auth(client):
    st, r = client.post("/predict")
    assert st == 401


def test_non_dict_json_body_is_400(client):
    """A JSON body that is a list/string/number must 400, not
    AttributeError-500 at the first .get."""
    st, r = client.post("/user_login", json_body=[1])
    assert st == 400
    st, r = client.post("/user_signup", json_body="nope")
    assert st == 400
    # FALSY non-dict bodies ([], "", 0, false) must hit the same 400, not
    # silently fall back to the empty-form missing-fields path (ADVICE r3)
    for body in ([], "", 0, False):
        st, r = client.post("/user_login", json_body=body)
        assert st == 400 and "object" in r["error"].lower(), body


def test_signup_email_link_prefers_configured_base_url(client, monkeypatch):
    """The verification email's absolute link must come from SOD_BASE_URL
    when configured, not the client-controlled Host header (ADVICE r3:
    host-header-injection phishing)."""
    monkeypatch.setenv("SOD_BASE_URL", "https://sod.example.org")
    st, r = client.post("/user_signup",
                        json_body={"name": "a", "email": "hh@x.com",
                                   "password": "p", "phone": ""},
                        headers={"Host": "evil.attacker.example"})
    assert st == 200
    sent = client.app.emailer.sent[-1]
    assert "https://sod.example.org/verify_signup/" in sent["html"]
    assert "evil.attacker.example" not in sent["html"]


def test_double_verify_is_controlled_400(client):
    """Two signup tokens for one address (double-submitted form): the
    second verification returns a clean 400, not a raw UNIQUE-constraint
    500."""
    st, r1 = client.post("/user_signup", json_body={
        "name": "a", "email": "dup@x.com", "password": "p", "phone": ""})
    st, r2 = client.post("/user_signup", json_body={
        "name": "a", "email": "dup@x.com", "password": "p", "phone": ""})
    st, _ = client.get(r1["verify_url"])
    assert st == 200
    st, r = client.get(r2["verify_url"])
    assert st == 400 and "registered" in r["error"].lower()


def test_upload_limit_marks_subscription_expired(client):
    """ref app.py:2900-2916: exhausting the upload budget flips the
    subscription to 'expired' so Status-based analytics stop counting
    it."""
    uid = _signup_and_login(client, email="lim@x.com")
    client.app.db.execute(
        "INSERT INTO subscription (User_ID, Plan_Type, Status, Start_Date, "
        "End_Date, Upload_Limit, Uploads_Used, Payment_Method) VALUES "
        "(%s, 'Basic', 'Active', date('now'), date('now', '+30 day'), "
        "1, 1, 'Stripe')", (uid,))
    st, r = client.post("/save_image_info", files={
        "image": ("a.png", _png_bytes())})
    assert st == 403
    row = client.app.db.query_one(
        "SELECT Status FROM subscription WHERE User_ID=%s", (uid,))
    assert row["Status"] == "Expired"


def test_feedback_requires_text(client):
    """ref app.py:2685: missing feedback text is a 400, not a silent
    empty-text row polluting the sentiment analytics."""
    _signup_and_login(client, email="fb@x.com")
    st, r = client.post("/submit_feedback", json_body={
        "type": "general", "rating": 5})
    assert st == 400


def test_otp_reset_flow(client):
    _signup_and_login(client)
    st, r = client.post("/forgot_password",
                        json_body={"email": "u@example.com"})
    assert st == 200
    otp = client.app.tokens.otps["u@example.com"][0]
    st, r = client.post("/verify_otp", json_body={"email": "u@example.com",
                                                  "otp": "000000"})
    assert st == 400 or not r.get("success", True) if otp != "000000" else True
    st, r = client.post("/reset_password", json_body={
        "email": "u@example.com", "otp": otp, "new_password": "newpw"})
    assert st == 200 and r["success"]
    c2 = Client(client.app)
    st, r = c2.post("/user_login", json_body={"email": "u@example.com",
                                              "password": "newpw"})
    assert st == 200


def _png_bytes():
    img = Image.fromarray(
        (np.random.RandomState(0).rand(20, 20, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_upload_quota_and_subscription(client):
    _signup_and_login(client)
    png = _png_bytes()
    # free tier: 3 uploads
    for i in range(3):
        st, r = client.post("/save_image_info",
                            files={"image": (f"a{i}.png", png)})
        assert st == 200 and r["success"], r
    st, r = client.post("/save_image_info", files={"image": ("d.png", png)})
    assert st == 403

    # subscribe via the stub checkout
    st, r = client.post("/create-checkout-session",
                        json_body={"plan": "basic"})
    assert st == 200 and r["id"].startswith("cs_stub_")
    st, r = client.get(f"/payment-success?session_id={r['id']}")
    assert st == 200 and r["plan"] == "Basic"

    st, r = client.get("/get_payment_info")
    assert r["plan"] == "Basic" and r["upload_limit"] == 100

    # uploads allowed again, Uploads_Used bumps
    st, r = client.post("/save_image_info", files={"image": ("e.png", png)})
    assert st == 200
    st, r = client.get("/get_payment_info")
    assert r["uploads_used"] == 1


def test_upload_quota_atomic_across_workers(tmp_path):
    """Two app instances on one DB FILE (~ two pool workers) racing
    uploads must never over-admit past the free-tier cap: the quota
    check+insert runs under ``db.transaction()`` (BEGIN IMMEDIATE), so
    cross-process writers serialize on sqlite's file lock — a
    threading.Lock could not reach across workers (ADVICE r4)."""
    import threading

    db_path = str(tmp_path / "sod.db")
    mk = lambda: create_app(db=Database(db_path), load_model=False,  # noqa: E731
                            upload_dir=str(tmp_path / "static"),
                            secret_key="test-secret")
    a, b = Client(mk()), Client(mk())
    _signup_and_login(a)
    st, r = b.post("/user_login", json_body={"email": "u@example.com",
                                             "password": "pw123"})
    assert st == 200 and r["success"]

    png = _png_bytes()
    statuses = []
    lock = threading.Lock()

    def upload(c, i):
        st, _ = c.post("/save_image_info",
                       files={"image": (f"r{i}.png", png)})
        with lock:
            statuses.append(st)

    threads = [threading.Thread(target=upload, args=(c, i))
               for i, c in enumerate([a, b, a, b, a, b, a, b])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert sorted(statuses) == [200] * 3 + [403] * 5
    assert Database(db_path).scalar("SELECT COUNT(*) FROM image") == 3


def test_payment_success_not_replayable(client):
    """One paid session_id mints exactly ONE subscription (ADVICE r1:
    the ref re-inserts a 30-day sub on every /payment-success call)."""
    _signup_and_login(client)
    st, r = client.post("/create-checkout-session",
                        json_body={"plan": "pro"})
    sid = r["id"]
    st, r1 = client.get(f"/payment-success?session_id={sid}")
    assert st == 200 and r1["success"]
    st, r2 = client.get(f"/payment-success?session_id={sid}")
    assert st == 200 and r2.get("already_processed") is True
    assert r2["subscription_id"] == r1["subscription_id"]
    db = client.app.db
    assert db.scalar("SELECT COUNT(*) FROM subscription") == 1
    # an unknown/never-paid session id confirms nothing
    st, _ = client.get("/payment-success?session_id=cs_stub_bogus")
    assert st == 400


def test_admin_login_fail_closed(tmp_path, monkeypatch):
    """Without SOD_ADMIN_PASSWORD / explicit opt-in, the reference's
    fixed default credentials must NOT work (ADVICE r1)."""
    monkeypatch.delenv("SOD_ADMIN_PASSWORD", raising=False)
    monkeypatch.delenv("SOD_ALLOW_DEFAULT_ADMIN", raising=False)
    app = create_app(db=Database(":memory:"), load_model=False,
                     upload_dir=str(tmp_path / "s2"), secret_key="t",
                     allow_default_admin=False)
    c = Client(app)
    st, r = c.post("/admin_login", json_body={"email": "a@gmail.com",
                                              "password": "111"})
    assert st == 403


def test_upload_rejects_bad_extension(client):
    _signup_and_login(client)
    st, r = client.post("/save_image_info",
                        files={"image": ("evil.exe", b"xx")})
    assert st == 400


def test_feedback_flow(client):
    _signup_and_login(client)
    st, r = client.post("/submit_feedback",
                        json_body={"rating": 4, "type": "general",
                                   "text": "nice"})
    assert st == 200 and r["success"]
    st, r = client.post("/submit_feedback", json_body={"rating": 9})
    assert st == 400
    st, r = client.get("/get_feedback")
    assert len(r["feedback"]) == 1
    assert r["feedback"][0]["Rating"] == 4


def test_admin_analytics(client):
    _signup_and_login(client)
    png = _png_bytes()
    client.post("/save_image_info", files={"image": ("a.png", png)})
    client.post("/submit_feedback", json_body={"rating": 5, "text": "good"})

    admin = Client(client.app)
    st, r = admin.get("/api/overview")
    assert st == 401
    st, r = admin.post("/admin_login", json_body={"email": "a@gmail.com",
                                                  "password": "111"})
    assert st == 200
    st, r = admin.get("/api/overview")
    assert st == 200
    assert r["total_users"] == 1
    assert r["total_images"] == 1
    assert r["average_rating"] == 5.0

    st, r = admin.get("/api/data/user_management")
    assert st == 200
    # masked per ref app.py:1747-1751: first 4 chars kept, rest starred
    masked = r["rows"][0]["Password"]
    assert set(masked[4:]) == {"*"} and len(masked) > 4
    st, r = admin.get("/api/data/sqlite_master")
    assert st == 403

    for kind in ("users", "images", "results", "subscriptions", "feedback"):
        st, r = admin.get(f"/api/analytics/{kind}")
        assert st == 200, kind
    st, r = admin.get("/api/recent_activity")
    assert st == 200 and len(r["images"]) == 1


def test_diagnostics(client):
    st, r = client.get("/test_db")
    assert st == 200 and r["ok"]
    assert "user_management" in r["tables"]
    st, r = client.get("/test_connection")
    assert st == 200 and r["status"] == "ok"
    assert r["model_loaded"] is False
    # server-identity fields: with a stale process still bound to the
    # port (single-TPU-client rule), pid + boot time tell WHICH server
    # answered; "model" appears only once a model is loaded
    import os as _os

    assert r["pid"] == _os.getpid()
    assert r["booted_at"] <= r["time"]
    assert "model" not in r


def test_pages_render(client):
    st, body = client.get("/")
    assert st == 200 and b"Salient Object Detection" in body
    st, _ = client.get("/dashboard")
    assert st == 302     # redirect when not logged in


def test_password_hash_roundtrip():
    h = hash_password("secret")
    assert h.startswith("scrypt:32768:8:1$")
    assert check_password(h, "secret")
    assert not check_password(h, "wrong")
    # werkzeug-format hash from the shipped dump verifies structurally
    assert not check_password("scrypt:32768:8:1$abc$00ff", "x")


def test_round1_database_migrates(tmp_path):
    """Opening a pre-round-2 sod.db must migrate, not crash: round 1's
    schema lacks Session_ID/timestamps and the unique index referenced
    them (code-review r2 finding, reproduced)."""
    import sqlite3

    db_fp = str(tmp_path / "old.db")
    conn = sqlite3.connect(db_fp)
    conn.executescript("""
      CREATE TABLE user_management (
        User_ID INTEGER PRIMARY KEY AUTOINCREMENT, Name VARCHAR(100),
        Email VARCHAR(100) UNIQUE, Password VARCHAR(255), Phone VARCHAR(20));
      CREATE TABLE admin (
        Admin_ID INTEGER PRIMARY KEY AUTOINCREMENT, Name VARCHAR(100),
        Email VARCHAR(100) UNIQUE, Password VARCHAR(100), Salary INTEGER);
      CREATE TABLE image (
        image_id INTEGER PRIMARY KEY AUTOINCREMENT,
        uploaded_image VARCHAR(255), file_type VARCHAR(10),
        file_size INTEGER, user_id INTEGER);
      CREATE TABLE result (
        Result_ID INTEGER PRIMARY KEY AUTOINCREMENT, Result_data TEXT,
        Image_ID INTEGER, User_ID INTEGER);
      CREATE TABLE subscription (
        Subscription_ID INTEGER PRIMARY KEY AUTOINCREMENT,
        Plan_Type TEXT NOT NULL, Start_Date DATE, End_Date DATE,
        Status TEXT DEFAULT 'Active', Upload_Limit INTEGER,
        Uploads_Used INTEGER DEFAULT 0, Amount_Paid DECIMAL(10,2),
        Payment_Method TEXT NOT NULL, User_ID INTEGER NOT NULL);
      CREATE TABLE feedback (
        Feedback_ID INTEGER PRIMARY KEY AUTOINCREMENT, Rating INTEGER,
        Feedback_Type VARCHAR(50), Feedback_Text TEXT, User_ID INTEGER);
    """)
    conn.execute("INSERT INTO user_management (Name, Email, Password) "
                 "VALUES ('Old', 'old@x.com', 'pw')")
    conn.commit()
    conn.close()

    db = Database(db_fp)                 # must not raise
    cols = {r["name"] for r in db.query("PRAGMA table_info(subscription)")}
    assert "Session_ID" in cols
    assert db.scalar("SELECT COUNT(*) FROM user_management") == 1

    # the full product works on the migrated DB, and new rows carry
    # explicit timestamps (migrated columns have no DEFAULT)
    app = create_app(db=db, load_model=False,
                     upload_dir=str(tmp_path / "static"), secret_key="t",
                     allow_default_admin=True)
    c = Client(app)
    _signup_and_login(c, email="new@x.com")
    c.post("/save_image_info", files={"image": ("a.png", _png_bytes())})
    assert db.scalar("SELECT uploaded_at FROM image") is not None
    assert db.scalar("SELECT created_at FROM user_management "
                     "WHERE Email='new@x.com'") is not None
    st, r = c.get("/get_recent_uploaded_times")
    assert st == 200 and len(r["timestamps"]) == 1


def test_session_cookie_attributes(client):
    """The signed session cookie must carry HttpOnly (no JS access) and
    SameSite=Lax (no cross-site POST rides — CSRF containment for the
    state-changing JSON routes)."""
    _signup_and_login(client)
    raw = client.last_set_cookie
    assert raw is not None
    assert "HttpOnly" in raw and "SameSite=Lax" in raw and "Path=/" in raw
