"""Serving / product layer (ref ``app.py``, 4080 LoC Flask+MySQL+Stripe).

Rebuilt dependency-free on the Python stdlib:

* ``web.py``        — micro WSGI framework (routing, JSON, signed-cookie
                      sessions, login_required) replacing Flask;
* ``db.py``         — sqlite3 persistence implementing the ``sod.sql``
                      schema (MySQL via MySQLdb when available);
* ``inference.py``  — the jit-compiled saliency model service
                      (``SelfMaskInference`` equivalent, ref app.py:161-347);
* ``payments.py``   — subscription plans + Stripe checkout (real stripe SDK
                      when importable, deterministic stub otherwise);
* ``emailer.py``    — verification/OTP mail (SMTP or console backend);
* ``app.py``        — the full route surface (auth, quotas, payments,
                      feedback, admin analytics, diagnostics, /predict).
"""
from sod_tpu.serving.app import create_app  # noqa: F401
