"""Subscriptions & payments (ref ``app.py:3060-3215``).

Plans mirror the reference exactly: Basic $9.99 / Pro $24.99 / Enterprise
$99.99 (ref ``app.py:3066-3076``), 30-day terms with upload limits
100 / 500 / 1500 (ref ``app.py:3111-3115``).  Checkout goes through the
real Stripe SDK when importable and ``STRIPE_SECRET_KEY`` is set;
otherwise a deterministic local stub emulates the session flow so the
product works end-to-end offline.
"""
from __future__ import annotations

import os
import secrets
import time
from typing import Dict, Optional

PLANS: Dict[str, Dict] = {
    "basic": {"name": "Basic", "price_usd": 9.99, "upload_limit": 100},
    "pro": {"name": "Pro", "price_usd": 24.99, "upload_limit": 500},
    "enterprise": {"name": "Enterprise", "price_usd": 99.99,
                   "upload_limit": 1500},
}
SUBSCRIPTION_DAYS = 30


class PaymentProvider:
    def __init__(self, stub_store=None):
        """:param stub_store: optional ``Database`` for the stub-mode
        checkout sessions.  Multi-process serving (``serving/pool.py``)
        needs it: the success redirect travels through the browser and
        may land on a different worker than the one that created the
        session, so in-memory stub state would 404 the confirm.  Stripe
        mode is unaffected (sessions live server-side at Stripe)."""
        self._stripe = None
        key = os.environ.get("STRIPE_SECRET_KEY")
        if key:
            try:
                import stripe

                stripe.api_key = key
                self._stripe = stripe
            except ImportError:
                self._stripe = None
        self._stub_sessions: Dict[str, Dict] = {}
        self._stub_db = stub_store
        if stub_store is not None:
            stub_store.execute(
                "CREATE TABLE IF NOT EXISTS checkout_stub ("
                "sid TEXT PRIMARY KEY, plan TEXT, user_id INTEGER, "
                "created REAL)")

    @property
    def mode(self) -> str:
        return "stripe" if self._stripe else "stub"

    def create_checkout_session(self, plan: str, user_id: int,
                                success_url: str, cancel_url: str) -> Dict:
        """ref ``/create-checkout-session`` (``app.py:3060-3097``)."""
        if plan not in PLANS:
            raise ValueError(f"unknown plan {plan}")
        info = PLANS[plan]
        if self._stripe:
            session = self._stripe.checkout.Session.create(
                payment_method_types=["card"],
                line_items=[{
                    "price_data": {
                        "currency": "usd",
                        "product_data": {"name": f"SOD {info['name']} Plan"},
                        "unit_amount": int(info["price_usd"] * 100),
                    },
                    "quantity": 1,
                }],
                mode="payment",
                success_url=success_url,
                cancel_url=cancel_url,
                metadata={"plan": plan, "user_id": str(user_id)},
            )
            return {"id": session.id, "url": session.url, "mode": "stripe"}
        sid = f"cs_stub_{secrets.token_hex(12)}"
        if self._stub_db is not None:
            self._stub_db.execute(
                "INSERT INTO checkout_stub VALUES (%s, %s, %s, %s)",
                (sid, plan, user_id, time.time()))
        else:
            self._stub_sessions[sid] = {"plan": plan, "user_id": user_id,
                                        "created": time.time(),
                                        "paid": False}
        return {"id": sid,
                "url": f"{success_url}?session_id={sid}", "mode": "stub"}

    def confirm(self, session_id: str) -> Optional[Dict]:
        """Resolve a (stub or stripe) session to {plan, user_id} if paid.

        One-shot for stub sessions: the session is consumed (popped) so a
        session_id cannot mint more than one subscription.  Stripe
        sessions stay retrievable server-side, so the caller must also
        dedupe on the persisted ``subscription.Session_ID`` (the app layer
        does — see ``/payment-success``).
        """
        if self._stripe and not session_id.startswith("cs_stub_"):
            s = self._stripe.checkout.Session.retrieve(session_id)
            if s.payment_status == "paid":
                return {"plan": s.metadata["plan"],
                        "user_id": int(s.metadata["user_id"])}
            return None
        if self._stub_db is not None:
            # one-shot pop under the sqlite write lock (cross-process
            # atomic; the app layer's unique Session_ID index is the
            # second line of defense against double-mint)
            conn = self._stub_db._conn()
            conn.execute("BEGIN IMMEDIATE")
            try:
                row = conn.execute(
                    "SELECT plan, user_id FROM checkout_stub "
                    "WHERE sid = ?", (session_id,)).fetchone()
                conn.execute("DELETE FROM checkout_stub WHERE sid = ?",
                             (session_id,))
                conn.commit()
            except BaseException:
                conn.rollback()
                raise
            if row is None:
                return None
            return {"plan": row["plan"], "user_id": row["user_id"]}
        s = self._stub_sessions.pop(session_id, None)
        if s is None:
            return None
        return {"plan": s["plan"], "user_id": s["user_id"]}
