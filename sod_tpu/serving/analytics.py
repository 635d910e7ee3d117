"""Admin / analytics JSON API — route-for-route rebuild of the
reference's analytics surface (ref ``app.py:1705-2664`` per-entity
analytics + ``app.py:3218-3797`` visualization endpoints; the full
route↔handler map lives in ``docs/SERVING.md``).

The reference ran these against MySQL; this rebuild speaks the sqlite
dialect (``DATE_SUB(NOW(), INTERVAL n DAY)`` → ``datetime('now','-n
days')``, ``DATE_FORMAT`` → ``strftime``, ``HOUR()`` →
``strftime('%H')``).  Reference quirk handled deliberately: several ref
queries reference columns missing from its own shipped ``sod.sql``
(``created_at``/``uploaded_at``/``processed_at``/``feedback.Result_ID``)
and therefore 500 at runtime — our schema adds those columns
(``schema.sql``) so every endpoint below actually works.

Auth: the reference puts plain ``login_required`` on everything.  Here
the aggregate endpoints keep that, but raw-row surfaces (table browser,
admin profile, password-hash migration) require an admin session —
documented deviation (see ADVICE r1 on admin exposure).
"""
from __future__ import annotations

import datetime as dt
from collections import Counter

from sod_tpu.serving.web import App, Request, jsonify, login_required

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

#: friendly-name → actual table (ref ``valid_tables``, app.py:1710-1717)
VALID_TABLES = {
    "users": "user_management",
    "images": "image",
    "results": "result",
    "subscriptions": "subscription",
    "feedback": "feedback",
    "admin": "admin",
}

POSITIVE_WORDS = ["good", "great", "excellent", "amazing", "love",
                  "perfect", "happy", "satisfied", "awesome", "wonderful"]
NEGATIVE_WORDS = ["bad", "poor", "hate", "worst", "terrible",
                  "disappointed", "awful", "issue", "problem", "broken"]


def _admin_required(fn):
    def wrapper(req: Request, *a, **kw):
        if not req.session.get("admin_id"):
            return jsonify({"error": "Admin authentication required"},
                           status=401)
        return fn(req, *a, **kw)

    wrapper.__name__ = fn.__name__
    return wrapper


def _fmt_dt(value, fmt: str) -> str:
    """Format a sqlite timestamp/date string like the ref's strftime on
    MySQL datetime objects (ref app.py:1744 etc.)."""
    if value is None:
        return value
    s = str(value)
    for parse in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return dt.datetime.strptime(s[:19], parse).strftime(fmt)
        except ValueError:
            continue
    return s


def _mask_password(pw) -> str:
    """ref app.py:1747-1751: keep first 4 chars, star the rest."""
    if pw and len(pw) > 4:
        return pw[:4] + "*" * (len(pw) - 4)
    return "****"


def _sentiment_counts(texts) -> dict:
    """ref app.py:2258-2274 / 3610-3630: keyword sentiment buckets."""
    pos = neg = neu = 0
    for t in texts:
        if not t:
            continue
        low = t.lower()
        if any(w in low for w in POSITIVE_WORDS):
            pos += 1
        elif any(w in low for w in NEGATIVE_WORDS):
            neg += 1
        else:
            neu += 1
    return {"positive": pos, "negative": neg, "neutral": neu}


def _month_day(date_str: str) -> str:
    """'%b %d' (ref app.py:3388) — sqlite strftime has no %b."""
    return _fmt_dt(date_str, "%b %d")


def _feedback_breakdown(db, where: str, type_keys) -> dict:
    """Shared body of /api/feedback/general and /api/feedback/result
    (ref app.py:2349-2492: 12-column aggregate + 7-day trend)."""
    row = db.query_one(
        "SELECT COUNT(*) AS count, AVG(Rating) AS avg_rating, "
        + ", ".join(
            f"SUM(CASE WHEN Feedback_Type = '{k}' THEN 1 ELSE 0 END) "
            f"AS type_{k}" for k in type_keys)
        + ", SUM(CASE WHEN Feedback_Text LIKE '%good%' OR Feedback_Text "
          "LIKE '%great%' THEN 1 ELSE 0 END) AS positive"
          ", SUM(CASE WHEN Feedback_Text LIKE '%bad%' OR Feedback_Text "
          "LIKE '%poor%' THEN 1 ELSE 0 END) AS negative"
        + ", ".join(
            [""] + [f"SUM(Rating = {i}) AS rating_{i}" for i in range(1, 6)])
        + f" FROM feedback WHERE {where}")
    count = row["count"] or 0
    pos, neg = row["positive"] or 0, row["negative"] or 0
    trend = [
        {"date": r["date"], "count": r["count"],
         "avg_rating": float(r["avg_rating"] or 0)}
        for r in db.query(
            "SELECT date(created_at) AS date, COUNT(*) AS count, "
            "AVG(Rating) AS avg_rating FROM feedback "
            f"WHERE {where} AND created_at >= datetime('now', '-7 days') "
            "GROUP BY date(created_at) ORDER BY date")]
    return {
        "count": count,
        "avg_rating": float(row["avg_rating"] or 0),
        "types": {k: row[f"type_{k}"] or 0 for k in type_keys},
        "sentiment": {"positive": pos, "negative": neg,
                      "neutral": count - pos - neg},
        "ratings": [{"rating": i, "count": row[f"rating_{i}"] or 0}
                    for i in range(1, 6)],
        "trend": trend,
    }


_COLOR_CASE = """
    CASE
        WHEN Result_data LIKE '%Red%' THEN 'Red'
        WHEN Result_data LIKE '%Green%' THEN 'Green'
        WHEN Result_data LIKE '%Blue%' THEN 'Blue'
        WHEN Result_data LIKE '%Yellow%' THEN 'Yellow'
        WHEN Result_data LIKE '%Purple%' THEN 'Purple'
        WHEN Result_data LIKE '%Orange%' THEN 'Orange'
        WHEN Result_data LIKE '%Pink%' THEN 'Pink'
        WHEN Result_data LIKE '%Brown%' THEN 'Brown'
        WHEN Result_data LIKE '%Black%' THEN 'Black'
        WHEN Result_data LIKE '%White%' THEN 'White'
        WHEN Result_data LIKE '%Gray%' OR Result_data LIKE '%Grey%'
            THEN 'Gray'
        ELSE 'Mixed/Other'
    END"""                                     # ref app.py:3490-3505

_FTYPE_CASE = """
    CASE
        WHEN Result_data LIKE '%jpg%' OR Result_data LIKE '%jpeg%'
            THEN 'JPEG'
        WHEN Result_data LIKE '%png%' THEN 'PNG'
        WHEN Result_data LIKE '%gif%' THEN 'GIF'
        WHEN Result_data LIKE '%webp%' THEN 'WebP'
        WHEN Result_data LIKE '%bmp%' THEN 'BMP'
        ELSE 'Other'
    END"""                                     # ref app.py:3523-3531


# ---------------------------------------------------------------------------
# registration
# ---------------------------------------------------------------------------

def register_analytics(app: App, db) -> None:   # noqa: C901 (route table)
    """Attach the full analytics route surface to ``app``."""

    # ------------------------------------------------------------------
    # table browser (ref /api/data/<table_name>, app.py:1705-1818)
    # ------------------------------------------------------------------
    @app.route("/api/data/<table_name>")
    @_admin_required
    def get_table_data(req: Request, table_name: str):
        # accept the ref's friendly names AND raw table names (round-1
        # compat: tests/templates used /api/data/user_management)
        reverse = {v: k for k, v in VALID_TABLES.items()}
        if table_name in reverse:
            table_name = reverse[table_name]
        if table_name not in VALID_TABLES:
            return jsonify({"error": "Invalid table name",
                            "valid_tables": list(VALID_TABLES)}, status=403)
        table = VALID_TABLES[table_name]
        rows = db.query(
            f"SELECT * FROM {table} ORDER BY 1 DESC LIMIT 100")  # noqa: S608
        for r in rows:
            if table_name == "users":
                if r.get("created_at"):
                    r["created_at"] = _fmt_dt(r["created_at"],
                                              "%Y-%m-%d %H:%M")
                if "Password" in r:
                    r["Password"] = _mask_password(r["Password"])
            elif table_name == "images":
                if r.get("uploaded_at"):
                    r["uploaded_at"] = _fmt_dt(r["uploaded_at"],
                                               "%Y-%m-%d %H:%M")
                if r.get("file_size") is not None:
                    r["file_size"] = f"{r['file_size']:.1f}"
            elif table_name == "results":
                if r.get("processed_at"):
                    r["processed_at"] = _fmt_dt(r["processed_at"],
                                                "%Y-%m-%d %H:%M")
                if r.get("Result_data") and len(r["Result_data"]) > 100:
                    r["Result_data"] = r["Result_data"][:100] + "..."
            elif table_name == "subscriptions":
                for k in ("Start_Date", "End_Date"):
                    if r.get(k):
                        r[k] = _fmt_dt(r[k], "%Y-%m-%d")
                if r.get("Amount_Paid") is not None:
                    r["Amount_Paid"] = f"{float(r['Amount_Paid']):.2f}"
                if r.get("Status"):
                    r["Status"] = r["Status"].title()
            elif table_name == "feedback":
                if r.get("Feedback_Text") and len(r["Feedback_Text"]) > 80:
                    r["Feedback_Text"] = r["Feedback_Text"][:80] + "..."
                if r.get("Feedback_Type"):
                    r["Feedback_Type"] = r["Feedback_Type"].title()
            elif table_name == "admin":
                if "Password" in r:
                    r["Password"] = _mask_password(r["Password"])
                if r.get("Salary") is not None:
                    r["Salary"] = f"{float(r['Salary']):,.2f}"
        return jsonify({
            "success": True, "data": rows, "rows": rows,
            "count": len(rows),
            "table_info": {
                "name": table_name,
                "display_name": table_name.replace("_", " ").title(),
                "total_records": len(rows),
            }})

    # ------------------------------------------------------------------
    # headline stats (ref /api/stats/overview, app.py:1821-1880)
    # ------------------------------------------------------------------
    @app.route("/api/stats/overview")
    @login_required
    def get_overview_stats(req: Request):
        stats = {
            "total_users": db.scalar(
                "SELECT COUNT(*) FROM user_management"),
            "total_images": db.scalar("SELECT COUNT(*) FROM image"),
            "avg_file_size": round(float(db.scalar(
                "SELECT AVG(file_size) FROM image") or 0), 2),
            "total_results": db.scalar("SELECT COUNT(*) FROM result"),
            "active_subscriptions": db.scalar(
                "SELECT COUNT(*) FROM subscription "
                "WHERE LOWER(Status) = 'active'"),
            "total_revenue": float(db.scalar(
                "SELECT SUM(Amount_Paid) FROM subscription "
                "WHERE LOWER(Status) = 'active'") or 0),
            "total_feedback": db.scalar("SELECT COUNT(*) FROM feedback"),
            "avg_rating": round(float(db.scalar(
                "SELECT AVG(Rating) FROM feedback") or 0), 1),
            "recent_uploads": db.scalar(
                "SELECT COUNT(*) FROM image WHERE uploaded_at >= "
                "datetime('now', '-7 days')"),
        }
        return jsonify({"success": True, "stats": stats})

    # ------------------------------------------------------------------
    # per-entity analytics (ref app.py:1883-2347)
    # ------------------------------------------------------------------
    @app.route("/api/analytics/users")
    @login_required
    def get_user_analytics(req: Request):
        registration_trend = db.query(
            "SELECT date(created_at) AS date, COUNT(*) AS count "
            "FROM user_management "
            "WHERE created_at >= datetime('now', '-30 days') "
            "GROUP BY date(created_at) ORDER BY date")
        activity_levels = db.query("""
            SELECT CASE
                WHEN upload_count = 0 THEN 'Inactive'
                WHEN upload_count BETWEEN 1 AND 5 THEN 'Low Activity'
                WHEN upload_count BETWEEN 6 AND 20 THEN 'Medium Activity'
                ELSE 'High Activity' END AS level, COUNT(*) AS count
            FROM (SELECT u.User_ID, COUNT(i.image_id) AS upload_count
                  FROM user_management u
                  LEFT JOIN image i ON u.User_ID = i.user_id
                  GROUP BY u.User_ID) GROUP BY level""")
        name_lengths = db.query("""
            SELECT CASE
                WHEN LENGTH(Name) BETWEEN 1 AND 5 THEN '1-5 chars'
                WHEN LENGTH(Name) BETWEEN 6 AND 10 THEN '6-10 chars'
                ELSE '10+ chars' END AS length, COUNT(*) AS count
            FROM user_management GROUP BY length""")
        return jsonify({"success": True,
                        "registration_trend": registration_trend,
                        "activity_levels": activity_levels,
                        "name_lengths": name_lengths})

    @app.route("/api/analytics/images")
    @login_required
    def get_image_analytics(req: Request):
        upload_trend = db.query(
            "SELECT date(uploaded_at) AS date, COUNT(*) AS count FROM image "
            "WHERE uploaded_at >= datetime('now', '-30 days') "
            "GROUP BY date(uploaded_at) ORDER BY date")
        file_types = [{"type": (r["file_type"] or "").upper(),
                       "count": r["count"]}
                      for r in db.query(
                          "SELECT file_type, COUNT(*) AS count FROM image "
                          "GROUP BY file_type ORDER BY count DESC")]
        size_distribution = db.query("""
            SELECT CASE
                WHEN file_size < 100 THEN '< 100 KB'
                WHEN file_size BETWEEN 100 AND 500 THEN '100-500 KB'
                WHEN file_size BETWEEN 500 AND 1000 THEN '500KB-1MB'
                ELSE '> 1 MB' END AS range, COUNT(*) AS count
            FROM image GROUP BY range""")
        hourly_pattern = [
            {"hour": f"{int(r['hour']):02d}:00", "count": r["count"]}
            for r in db.query(
                "SELECT strftime('%H', uploaded_at) AS hour, "
                "COUNT(*) AS count FROM image GROUP BY hour ORDER BY hour")]
        return jsonify({"success": True, "upload_trend": upload_trend,
                        "file_types": file_types,
                        "size_distribution": size_distribution,
                        "hourly_pattern": hourly_pattern})

    @app.route("/api/analytics/results")
    @login_required
    def get_result_analytics(req: Request):
        color_distribution = [{"color": r["color"], "count": r["count"]}
                              for r in db.query(
            f"SELECT {_COLOR_CASE} AS color, COUNT(*) AS count FROM result "
            "GROUP BY color ORDER BY count DESC")]
        processing_trend = db.query(
            "SELECT date(processed_at) AS date, COUNT(*) AS count "
            "FROM result WHERE processed_at >= datetime('now', '-30 days') "
            "GROUP BY date(processed_at) ORDER BY date")
        correlation_data = db.query(
            f"SELECT {_FTYPE_CASE} AS file_type, {_COLOR_CASE} AS color, "
            "COUNT(*) AS count FROM result GROUP BY file_type, color "
            "ORDER BY count DESC")
        return jsonify({"success": True,
                        "color_distribution": color_distribution,
                        "processing_trend": processing_trend,
                        "correlation_data": correlation_data})

    @app.route("/api/analytics/subscriptions")
    @login_required
    def get_subscription_analytics(req: Request):
        plan_distribution = [
            {"plan": (r["Plan_Type"] or "Unknown").title(),
             "count": r["count"], "revenue": float(r["revenue"] or 0)}
            for r in db.query(
                "SELECT Plan_Type, COUNT(*) AS count, "
                "SUM(Amount_Paid) AS revenue FROM subscription "
                "WHERE LOWER(Status) = 'active' "
                "GROUP BY Plan_Type ORDER BY count DESC")]
        revenue_trend = [
            {"month": r["month"], "revenue": float(r["revenue"] or 0),
             "subscriptions": r["subscriptions"]}
            for r in db.query(
                "SELECT strftime('%Y-%m', Start_Date) AS month, "
                "SUM(Amount_Paid) AS revenue, COUNT(*) AS subscriptions "
                "FROM subscription WHERE Start_Date >= "
                "date('now', '-12 months') GROUP BY month ORDER BY month")]
        duration_analysis = db.query("""
            SELECT CASE
                WHEN julianday(End_Date) - julianday(Start_Date) <= 30
                    THEN 'Monthly'
                WHEN julianday(End_Date) - julianday(Start_Date) <= 90
                    THEN 'Quarterly'
                WHEN julianday(End_Date) - julianday(Start_Date) <= 365
                    THEN 'Yearly'
                ELSE 'Long-term' END AS duration, COUNT(*) AS count
            FROM subscription GROUP BY duration""")
        return jsonify({"success": True,
                        "plan_distribution": plan_distribution,
                        "revenue_trend": revenue_trend,
                        "duration_analysis": duration_analysis})

    @app.route("/api/feedback/analytics")
    @login_required
    def get_feedback_analytics(req: Request):
        total = db.scalar("SELECT COUNT(*) FROM feedback") or 0
        avg_rating = float(db.scalar(
            "SELECT AVG(Rating) FROM feedback") or 0)
        type_counts = {"bug": 0, "feature": 0, "general": 0, "result": 0}
        for r in db.query("SELECT Feedback_Type, COUNT(*) AS count "
                          "FROM feedback GROUP BY Feedback_Type"):
            if r["Feedback_Type"] in type_counts:
                type_counts[r["Feedback_Type"]] = r["count"]
        by_rating = {r["Rating"]: r["count"] for r in db.query(
            "SELECT Rating, COUNT(*) AS count FROM feedback "
            "GROUP BY Rating")}
        rating_counts = [{"rating": i, "count": by_rating.get(i, 0)}
                         for i in range(1, 6)]
        sentiment = _sentiment_counts(
            r["Feedback_Text"] for r in db.query(
                "SELECT Feedback_Text FROM feedback "
                "WHERE Feedback_Text IS NOT NULL"))
        general = db.scalar(
            "SELECT COUNT(*) FROM feedback WHERE Result_ID IS NULL") or 0
        result = db.scalar(
            "SELECT COUNT(*) FROM feedback WHERE Result_ID IS NOT NULL") or 0
        return jsonify({"success": True, "stats": {
            "total": total, "avg_rating": avg_rating,
            "types": type_counts, "general": general, "result": result,
            "sentiment": sentiment, "ratings": rating_counts,
        }, "trend": []})   # ref returns an empty trend (app.py:2270)

    @app.route("/api/analytics/admin")
    @_admin_required
    def get_admin_analytics(req: Request):
        profile = None
        row = db.query_one("SELECT Admin_ID, Name, Email, Salary FROM admin "
                           "WHERE Admin_ID = %s",
                           (req.session["admin_id"],))
        if row:
            profile = {"admin_id": row["Admin_ID"], "name": row["Name"],
                       "email": row["Email"],
                       "salary": float(row["Salary"] or 0)}
        total_images = db.scalar("SELECT COUNT(*) FROM image")
        total_results = db.scalar("SELECT COUNT(*) FROM result")
        return jsonify({"success": True, "admin_profile": profile,
                        "system_metrics": {
            "total_users": db.scalar(
                "SELECT COUNT(*) FROM user_management"),
            "total_images": total_images,
            "total_results": total_results,
            "total_revenue": float(db.scalar(
                "SELECT SUM(Amount_Paid) FROM subscription "
                "WHERE LOWER(Status) = 'active'") or 0),
            "processing_efficiency": round(
                total_results / max(total_images, 1) * 100, 1),
        }})

    # ------------------------------------------------------------------
    # general/result feedback split (ref app.py:2349-2492)
    # ------------------------------------------------------------------
    @app.route("/api/feedback/general")
    @login_required
    def get_general_feedback(req: Request):
        return jsonify({"success": True, "data": _feedback_breakdown(
            db, "Result_ID IS NULL", ("bug", "feature", "general"))})

    @app.route("/api/feedback/result")
    @login_required
    def get_result_feedback(req: Request):
        return jsonify({"success": True, "data": _feedback_breakdown(
            db, "Result_ID IS NOT NULL", ("bug", "feature", "result"))})

    # ------------------------------------------------------------------
    # raw per-table counts (ref /api/stats, app.py:2493-2522)
    # ------------------------------------------------------------------
    @app.route("/api/stats")
    @login_required
    def get_stats(req: Request):
        stats = {}
        for table in ("user_management", "image", "result", "subscription",
                      "feedback", "admin"):
            try:
                stats[table] = db.scalar(
                    f"SELECT COUNT(*) FROM {table}")  # noqa: S608
            except Exception:
                stats[table] = 0
        return jsonify({"success": True, "stats": stats})

    # ------------------------------------------------------------------
    # auto-chart any table (ref /api/visualize/<t>, app.py:2567-2614)
    # ------------------------------------------------------------------
    @app.route("/api/visualize/<table_name>")
    @_admin_required
    def visualize_table(req: Request, table_name: str):
        if table_name not in VALID_TABLES:
            return jsonify({"success": False,
                            "message": "Invalid table name"})
        rows = db.query(
            f"SELECT * FROM {VALID_TABLES[table_name]}")  # noqa: S608
        columns = list(rows[0]) if rows else []

        def is_suitable(col, values):
            if "id" in col.lower():
                return False
            unique = set(values)
            return 1 < len(unique) <= 20 and all(
                isinstance(v, (str, int)) for v in unique)

        for col in columns:
            values = [r[col] for r in rows if r[col] is not None]
            if is_suitable(col, values):
                counts = Counter(str(v) for v in values)
                return jsonify({"success": True, "label": col,
                                "labels": list(counts),
                                "counts": list(counts.values())})
        return jsonify({"success": False,
                        "message": "No suitable column found to plot"})

    # ------------------------------------------------------------------
    # user-scoped recents (ref app.py:2617-2664)
    # ------------------------------------------------------------------
    @app.route("/get_recent_uploaded_times")
    @login_required
    def get_recent_uploaded_times(req: Request):
        rows = db.query(
            "SELECT image_id, uploaded_image, uploaded_at FROM image "
            "WHERE user_id = %s ORDER BY uploaded_at DESC LIMIT 3",
            (req.session.get("user_id"),))
        return jsonify({"success": True, "timestamps": [
            {"image_id": r["image_id"], "image_url": r["uploaded_image"],
             "uploaded_at": _fmt_dt(r["uploaded_at"], "%Y-%m-%d %H:%M:%S")}
            for r in rows]})

    @app.route("/get_recent_results")
    @login_required
    def get_recent_results(req: Request):
        rows = db.query(
            "SELECT Result_ID, processed_at FROM result WHERE User_ID = %s "
            "ORDER BY processed_at DESC LIMIT 5",
            (req.session.get("user_id"),))
        return jsonify({"success": True, "results": [
            {"result_id": r["Result_ID"],
             "processed_at": _fmt_dt(r["processed_at"],
                                     "%Y-%m-%d %H:%M:%S")} for r in rows]})

    # ------------------------------------------------------------------
    # legacy visualization endpoints (ref app.py:3218-3797) — these feed
    # templates/View.html's charts
    # ------------------------------------------------------------------
    @app.route("/api/visualization/user_stats")
    @login_required
    def user_stats(req: Request):
        user_activity = db.query("""
            SELECT CASE
                WHEN upload_count = 0 THEN 'No Uploads'
                WHEN upload_count = 1 THEN '1 Upload'
                WHEN upload_count BETWEEN 2 AND 5 THEN '2-5 Uploads'
                WHEN upload_count BETWEEN 6 AND 10 THEN '6-10 Uploads'
                ELSE '10+ Uploads' END AS level, COUNT(*) AS count
            FROM (SELECT u.User_ID,
                         COALESCE(COUNT(i.image_id), 0) AS upload_count
                  FROM user_management u
                  LEFT JOIN image i ON u.User_ID = i.user_id
                  GROUP BY u.User_ID)
            GROUP BY level
            ORDER BY CASE level WHEN 'No Uploads' THEN 1
                WHEN '1 Upload' THEN 2 WHEN '2-5 Uploads' THEN 3
                WHEN '6-10 Uploads' THEN 4 ELSE 5 END""")
        subscription_status = db.query("""
            SELECT CASE
                WHEN s.Subscription_ID IS NOT NULL
                     AND LOWER(s.Status) = 'active'
                    THEN 'Active Subscription'
                WHEN s.Subscription_ID IS NOT NULL
                    THEN 'Inactive Subscription'
                ELSE 'No Subscription' END AS status, COUNT(*) AS count
            FROM user_management u
            LEFT JOIN subscription s ON u.User_ID = s.User_ID
            GROUP BY status
            ORDER BY CASE status WHEN 'Active Subscription' THEN 1
                WHEN 'Inactive Subscription' THEN 2 ELSE 3 END""")
        return jsonify({"success": True,
                        "total_users": db.scalar(
                            "SELECT COUNT(*) FROM user_management"),
                        "user_activity": user_activity,
                        "subscription_status": subscription_status})

    @app.route("/api/user_name_lengths")
    @login_required
    def user_name_lengths(req: Request):
        rows = db.query("""
            SELECT CASE
                WHEN LENGTH(Name) BETWEEN 1 AND 5 THEN '1-5 chars'
                WHEN LENGTH(Name) BETWEEN 6 AND 10 THEN '6-10 chars'
                ELSE '10+ chars' END AS length, COUNT(*) AS count
            FROM user_management GROUP BY length""")
        return jsonify({"success": True, "data": rows})

    @app.route("/api/visualization/subscription_stats")
    @login_required
    def subscription_stats(req: Request):
        subscriptions = [
            {"plan": (r["Plan_Type"] or "Unknown").title(),
             "count": r["count"], "revenue": float(r["revenue"] or 0)}
            for r in db.query(
                "SELECT Plan_Type, COUNT(*) AS count, "
                "SUM(Amount_Paid) AS revenue FROM subscription "
                "WHERE LOWER(Status) = 'active' "
                "GROUP BY Plan_Type ORDER BY count DESC")]
        trend = [
            {"month": r["month"], "count": r["count"],
             "revenue": float(r["revenue"] or 0)}
            for r in db.query(
                "SELECT strftime('%Y-%m', Start_Date) AS month, "
                "COUNT(*) AS count, SUM(Amount_Paid) AS revenue "
                "FROM subscription WHERE Start_Date >= "
                "date('now', '-12 months') GROUP BY month ORDER BY month")]
        return jsonify({"success": True, "subscriptions": subscriptions,
                        "total_revenue": float(db.scalar(
                            "SELECT SUM(Amount_Paid) FROM subscription "
                            "WHERE LOWER(Status) = 'active'") or 0),
                        "trend": trend})

    @app.route("/api/visualization/image_stats")
    @login_required
    def image_stats(req: Request):
        uploads = [{"date": _month_day(r["date"]), "count": r["count"]}
                   for r in db.query(
            "SELECT date(uploaded_at) AS date, COUNT(*) AS count FROM image "
            "WHERE uploaded_at >= date('now', '-30 days') "
            "GROUP BY date(uploaded_at) ORDER BY date")]
        file_types = db.query("""
            SELECT CASE
                WHEN file_type IN ('jpg', 'jpeg') THEN 'JPEG'
                WHEN file_type = 'png' THEN 'PNG'
                WHEN file_type = 'gif' THEN 'GIF'
                WHEN file_type = 'webp' THEN 'WebP'
                WHEN file_type = 'bmp' THEN 'BMP'
                ELSE 'Other' END AS type, COUNT(*) AS count
            FROM image GROUP BY type ORDER BY count DESC""")
        size_distribution = db.query("""
            SELECT CASE
                WHEN file_size < 100 THEN '< 100 KB'
                WHEN file_size BETWEEN 100 AND 500 THEN '100-500 KB'
                WHEN file_size BETWEEN 500 AND 1000 THEN '500KB-1MB'
                WHEN file_size BETWEEN 1000 AND 5000 THEN '1-5 MB'
                ELSE '> 5 MB' END AS range, COUNT(*) AS count
            FROM image GROUP BY range
            ORDER BY CASE range WHEN '< 100 KB' THEN 1
                WHEN '100-500 KB' THEN 2 WHEN '500KB-1MB' THEN 3
                WHEN '1-5 MB' THEN 4 ELSE 5 END""")
        hourly_pattern = [
            {"hour": f"{int(r['hour']):02d}:00", "count": r["count"]}
            for r in db.query(
                "SELECT strftime('%H', uploaded_at) AS hour, "
                "COUNT(*) AS count FROM image GROUP BY hour ORDER BY hour")]
        user_activity = db.query("""
            SELECT CASE
                WHEN upload_count = 1 THEN '1 Upload'
                WHEN upload_count BETWEEN 2 AND 5 THEN '2-5 Uploads'
                WHEN upload_count BETWEEN 6 AND 10 THEN '6-10 Uploads'
                ELSE '10+ Uploads' END AS level, COUNT(*) AS count
            FROM (SELECT user_id, COUNT(*) AS upload_count FROM image
                  GROUP BY user_id)
            GROUP BY level
            ORDER BY CASE level WHEN '1 Upload' THEN 1
                WHEN '2-5 Uploads' THEN 2 WHEN '6-10 Uploads' THEN 3
                ELSE 4 END""")
        return jsonify({"success": True, "uploads": uploads,
                        "file_types": file_types,
                        "size_distribution": size_distribution,
                        "hourly_pattern": hourly_pattern,
                        "user_activity": user_activity,
                        "total_images": db.scalar(
                            "SELECT COUNT(*) FROM image"),
                        "avg_file_size": round(float(db.scalar(
                            "SELECT AVG(file_size) FROM image") or 0), 2)})

    @app.route("/api/visualization/result_stats")
    @login_required
    def result_stats(req: Request):
        colors = [{"color": r["color"], "count": r["count"]}
                  for r in db.query(
            f"SELECT {_COLOR_CASE} AS color, COUNT(*) AS count FROM result "
            "GROUP BY color ORDER BY count DESC")]
        file_types = [{"type": r["file_type"], "count": r["count"]}
                      for r in db.query(
            f"SELECT {_FTYPE_CASE} AS file_type, COUNT(*) AS count "
            "FROM result GROUP BY file_type ORDER BY count DESC")]
        total_processed = db.scalar("SELECT COUNT(*) FROM result")
        total_images = db.scalar("SELECT COUNT(*) FROM image")
        peak_hours = [
            {"hour": f"{int(r['hour']):02d}:00", "count": r["count"]}
            for r in db.query(
                "SELECT strftime('%H', i.uploaded_at) AS hour, "
                "COUNT(*) AS count FROM image i "
                "JOIN result r ON i.image_id = r.Image_ID "
                "GROUP BY hour ORDER BY count DESC LIMIT 5")]
        return jsonify({
            "success": True, "colors": colors, "file_types": file_types,
            "avg_file_size": round(float(db.scalar(
                "SELECT AVG(file_size) FROM image") or 0), 2),
            "success_rate": round(
                total_processed / total_images * 100, 1)
            if total_images else 0,
            "total_processed": total_processed, "peak_hours": peak_hours})

    @app.route("/api/visualization/feedback_stats")
    @login_required
    def feedback_stats(req: Request):
        type_stats = [{"type": r["Feedback_Type"], "count": r["count"]}
                      for r in db.query(
            "SELECT Feedback_Type, COUNT(*) AS count FROM feedback "
            "GROUP BY Feedback_Type")]
        rating_stats = [{"rating": r["Rating"], "count": r["count"]}
                        for r in db.query(
            "SELECT Rating, COUNT(*) AS count FROM feedback "
            "GROUP BY Rating ORDER BY Rating")]
        texts = [r["Feedback_Text"] for r in db.query(
            "SELECT Feedback_Text FROM feedback")]
        words = [w.lower() for t in texts if t for w in t.split()
                 if len(w) > 3 and w.isalpha()]
        word_stats = [{"word": w, "count": c}
                      for w, c in Counter(words).most_common(20)]
        return jsonify({"success": True, "feedback_types": type_stats,
                        "ratings": rating_stats, "word_stats": word_stats,
                        "sentiment": _sentiment_counts(texts)})

    @app.route("/api/admin_data")
    @_admin_required
    def get_admin_profile(req: Request):
        row = db.query_one(
            "SELECT Admin_ID, Name, Email, Salary FROM admin "
            "WHERE Admin_ID = %s", (req.session["admin_id"],))
        if row is None:
            return jsonify({"success": False,
                            "message": "Admin not found"}, status=404)
        return jsonify({"success": True, "admin_id": row["Admin_ID"],
                        "name": row["Name"], "email": row["Email"],
                        "salary": row["Salary"]})

    @app.route("/api/visualization/result_data")
    @login_required
    def get_result_data(req: Request):
        color_data = [{"name": r["color"], "count": r["count"]}
                      for r in db.query(
            f"SELECT {_COLOR_CASE} AS color, COUNT(*) AS count FROM result "
            "GROUP BY color ORDER BY count DESC")]
        file_type_data = [{"name": r["file_type"], "count": r["count"]}
                          for r in db.query(
            f"SELECT {_FTYPE_CASE} AS file_type, COUNT(*) AS count "
            "FROM result GROUP BY file_type ORDER BY count DESC")]
        # "Size: <x> KB" substring parse (ref app.py:3704-3716)
        size_data = [{"name": r["range"], "count": r["count"]}
                     for r in db.query("""
            SELECT CASE
                WHEN CAST(substr(Result_data,
                    instr(Result_data, 'Size: ') + 6) AS REAL) < 100
                    THEN '< 100 KB'
                WHEN CAST(substr(Result_data,
                    instr(Result_data, 'Size: ') + 6) AS REAL) <= 500
                    THEN '100-500 KB'
                WHEN CAST(substr(Result_data,
                    instr(Result_data, 'Size: ') + 6) AS REAL) <= 1000
                    THEN '500KB-1MB'
                WHEN CAST(substr(Result_data,
                    instr(Result_data, 'Size: ') + 6) AS REAL) <= 5000
                    THEN '1-5 MB'
                ELSE '> 5 MB' END AS range, COUNT(*) AS count
            FROM result WHERE Result_data LIKE '%Size:%'
            GROUP BY range
            ORDER BY CASE range WHEN '< 100 KB' THEN 1
                WHEN '100-500 KB' THEN 2 WHEN '500KB-1MB' THEN 3
                WHEN '1-5 MB' THEN 4 ELSE 5 END""")]
        processing_trend = [{"date": _month_day(r["date"]),
                             "count": r["count"]}
                            for r in db.query(
            "SELECT date(i.uploaded_at) AS date, COUNT(*) AS count "
            "FROM result r JOIN image i ON r.Image_ID = i.image_id "
            "WHERE i.uploaded_at >= date('now', '-30 days') "
            "GROUP BY date(i.uploaded_at) ORDER BY date")]
        correlation_data = db.query(
            f"SELECT {_FTYPE_CASE} AS file_type, {_COLOR_CASE} AS color, "
            "COUNT(*) AS count FROM result GROUP BY file_type, color "
            "ORDER BY count DESC LIMIT 10")
        total_processed = db.scalar("SELECT COUNT(*) FROM result")
        total_images = db.scalar("SELECT COUNT(*) FROM image")
        return jsonify({
            "success": True, "color_data": color_data,
            "file_type_data": file_type_data, "size_data": size_data,
            "processing_trend": processing_trend,
            "correlation_data": correlation_data,
            "success_rate": round(total_processed / total_images * 100, 1)
            if total_images else 0,
            "total_processed": total_processed,
            "total_images": total_images})
