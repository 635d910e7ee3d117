"""Email verification + OTP delivery (ref ``app.py:516-1141``: signup
verification links with 10-minute expiry and the forgot-password OTP flow,
sent as HTML mail via Gmail SMTP).

Backends: SMTP when ``SOD_SMTP_HOST`` is configured; otherwise a console/
capture backend so flows are testable offline.  Token/OTP bookkeeping is
in-memory like the reference's ``signup_data`` dict (``app.py:516-520``).
"""
from __future__ import annotations

import os
import secrets
import threading
import time
from typing import Dict, List, Optional, Tuple

TOKEN_TTL_SECONDS = 600       # 10 minutes (ref app.py:560-566)
OTP_TTL_SECONDS = 600


class Emailer:
    #: capture/audit log is bounded — an always-on server must not
    #: accumulate every email body forever
    MAX_SENT = 500

    def __init__(self):
        from collections import deque

        self.sent = deque(maxlen=self.MAX_SENT)
        self.host = os.environ.get("SOD_SMTP_HOST")
        self.port = int(os.environ.get("SOD_SMTP_PORT", "587"))
        self.user = os.environ.get("SOD_SMTP_USER", "")
        self.password = os.environ.get("SOD_SMTP_PASSWORD", "")
        self.sender = os.environ.get("SOD_MAIL_FROM", "noreply@sod.local")

    def send(self, to: str, subject: str, html: str) -> None:
        record = {"to": to, "subject": subject, "html": html,
                  "time": time.time()}
        self.sent.append(record)
        if not self.host:
            print(f"[email:console] to={to} subject={subject}")
            return
        import smtplib
        from email.mime.text import MIMEText

        msg = MIMEText(html, "html")
        msg["Subject"] = subject
        msg["From"] = self.sender
        msg["To"] = to
        with smtplib.SMTP(self.host, self.port) as s:
            s.starttls()
            if self.user:
                s.login(self.user, self.password)
            s.sendmail(self.sender, [to], msg.as_string())


class TokenStore:
    """In-memory pending-signup + OTP store (ref ``signup_data``,
    ``app.py:516-592`` and the OTP flow ``app.py:1035-1141``)."""

    def __init__(self):
        self.pending_signups: Dict[str, Dict] = {}
        self.otps: Dict[str, Tuple[str, float]] = {}
        self.otp_attempts: Dict[str, int] = {}
        # the wrong-guess counter is a read-modify-write; under the
        # threaded WSGI server concurrent guesses could interleave and
        # exceed OTP_MAX_ATTEMPTS before the code is burned
        self._otp_lock = threading.Lock()

    # --- signup verification ----------------------------------------------
    def create_signup(self, name: str, email: str, password_hash: str,
                      phone: str) -> str:
        # sweep expired entries — unverified (bot) signups would otherwise
        # accumulate forever in the long-running server
        now = time.time()
        for k in [k for k, v in self.pending_signups.items()
                  if v["expires"] < now]:
            del self.pending_signups[k]
        token = secrets.token_urlsafe(24)
        self.pending_signups[token] = {
            "name": name, "email": email, "password": password_hash,
            "phone": phone, "expires": time.time() + TOKEN_TTL_SECONDS,
        }
        return token

    def pop_signup(self, token: str) -> Optional[Dict]:
        data = self.pending_signups.pop(token, None)
        if data is None or data["expires"] < time.time():
            return None
        return data

    # --- OTP ----------------------------------------------------------------
    #: wrong-guess budget per OTP: a 6-digit code with unlimited tries is
    #: a brute-force oracle over its whole TTL (10^6 guesses in minutes at
    #: HTTP rates); 5 tries keeps the success probability at 5e-6
    OTP_MAX_ATTEMPTS = 5

    def create_otp(self, email: str) -> str:
        otp = f"{secrets.randbelow(1000000):06d}"
        with self._otp_lock:
            self.otps[email] = (otp, time.time() + OTP_TTL_SECONDS)
            self.otp_attempts[email] = 0
        return otp

    def verify_otp(self, email: str, otp: str) -> bool:
        with self._otp_lock:
            stored = self.otps.get(email)
            if stored is None:
                return False
            value, expires = stored
            if expires < time.time():
                self.otps.pop(email, None)
                self.otp_attempts.pop(email, None)
                return False
            ok = secrets.compare_digest(value, otp)
            if not ok:
                self.otp_attempts[email] = self.otp_attempts.get(email, 0) + 1
                if self.otp_attempts[email] >= self.OTP_MAX_ATTEMPTS:
                    # burn the code: the caller must request a fresh OTP
                    self.otps.pop(email, None)
                    self.otp_attempts.pop(email, None)
            return ok

    def consume_otp(self, email: str) -> None:
        with self._otp_lock:
            self.otps.pop(email, None)
            self.otp_attempts.pop(email, None)


class DbTokenStore(TokenStore):
    """sqlite-backed token store for multi-process serving
    (``serving/pool.py``): a signup/OTP created on one worker must verify
    on any other, so the reference's in-memory ``signup_data`` semantics
    (``app.py:516-592``) move to shared tables.  Same behavior as the
    in-memory base — TTL sweep, one-shot pop, 5-attempt OTP budget — with
    ``BEGIN IMMEDIATE`` transactions as the cross-process lock (sqlite
    serializes writers; python's 5 s busy timeout absorbs contention).
    """

    def __init__(self, db):
        super().__init__()
        self.db = db
        db.execute(
            "CREATE TABLE IF NOT EXISTS pending_signup ("
            "token TEXT PRIMARY KEY, name TEXT, email TEXT, "
            "password TEXT, phone TEXT, expires REAL)")
        db.execute(
            "CREATE TABLE IF NOT EXISTS otp ("
            "email TEXT PRIMARY KEY, otp TEXT, expires REAL, "
            "attempts INTEGER NOT NULL DEFAULT 0)")

    # --- signup verification ----------------------------------------------
    def create_signup(self, name: str, email: str, password_hash: str,
                      phone: str) -> str:
        now = time.time()
        self.db.execute("DELETE FROM pending_signup WHERE expires < %s",
                        (now,))
        token = secrets.token_urlsafe(24)
        self.db.execute(
            "INSERT INTO pending_signup VALUES (%s, %s, %s, %s, %s, %s)",
            (token, name, email, password_hash, phone,
             now + TOKEN_TTL_SECONDS))
        return token

    def pop_signup(self, token: str) -> Optional[Dict]:
        conn = self.db._conn()
        conn.execute("BEGIN IMMEDIATE")
        try:
            row = conn.execute(
                "SELECT * FROM pending_signup WHERE token = ?",
                (token,)).fetchone()
            conn.execute("DELETE FROM pending_signup WHERE token = ?",
                         (token,))
            conn.commit()
        except BaseException:
            conn.rollback()
            raise
        if row is None or row["expires"] < time.time():
            return None
        return {"name": row["name"], "email": row["email"],
                "password": row["password"], "phone": row["phone"],
                "expires": row["expires"]}

    # --- OTP ----------------------------------------------------------------
    def create_otp(self, email: str) -> str:
        otp = f"{secrets.randbelow(1000000):06d}"
        self.db.execute(
            "INSERT INTO otp (email, otp, expires, attempts) "
            "VALUES (%s, %s, %s, 0) ON CONFLICT(email) DO UPDATE SET "
            "otp = excluded.otp, expires = excluded.expires, attempts = 0",
            (email, otp, time.time() + OTP_TTL_SECONDS))
        return otp

    def verify_otp(self, email: str, otp: str) -> bool:
        conn = self.db._conn()
        conn.execute("BEGIN IMMEDIATE")
        try:
            row = conn.execute(
                "SELECT otp, expires, attempts FROM otp WHERE email = ?",
                (email,)).fetchone()
            if row is None:
                conn.commit()
                return False
            if row["expires"] < time.time():
                conn.execute("DELETE FROM otp WHERE email = ?", (email,))
                conn.commit()
                return False
            ok = secrets.compare_digest(row["otp"], otp)
            if not ok:
                if row["attempts"] + 1 >= self.OTP_MAX_ATTEMPTS:
                    # burn the code: the caller must request a fresh OTP
                    conn.execute("DELETE FROM otp WHERE email = ?",
                                 (email,))
                else:
                    conn.execute(
                        "UPDATE otp SET attempts = attempts + 1 "
                        "WHERE email = ?", (email,))
            conn.commit()
            return ok
        except BaseException:
            conn.rollback()
            raise

    def consume_otp(self, email: str) -> None:
        self.db.execute("DELETE FROM otp WHERE email = %s", (email,))
