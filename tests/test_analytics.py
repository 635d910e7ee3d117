"""Route-for-route analytics surface (ref app.py:1705-2664 + 3218-3797).

Seeds a realistic DB (users, images, results, subscriptions, feedback)
then asserts each endpoint's response shape and key aggregates.
"""
import pytest

from sod_tpu.serving.app import create_app
from sod_tpu.serving.db import Database, hash_password
from tests.test_serving import Client


@pytest.fixture()
def seeded(tmp_path):
    db = Database(":memory:")
    for i in range(3):
        db.execute(
            "INSERT INTO user_management (Name, Email, Password, Phone) "
            "VALUES (%s, %s, %s, %s)",
            (f"User{'x' * i * 4}{i}", f"u{i}@x.com",
             hash_password("pw"), "1"))
    for i in range(5):
        uid = (i % 2) + 1
        img = db.execute(
            "INSERT INTO image (uploaded_image, file_type, file_size, "
            "user_id) VALUES (%s, %s, %s, %s)",
            (f"f{i}.png", "png" if i % 2 else "jpg", 50 + 200 * i, uid))
        db.execute(
            "INSERT INTO result (Result_data, Image_ID, User_ID) VALUES "
            "(%s, %s, %s)",
            (f"Dominant Color: {'Red' if i % 2 else 'Blue'}, Type: png, "
             f"Size: {50 + 200 * i:.2f} KB", img, uid))
    db.execute(
        "INSERT INTO subscription (Plan_Type, Start_Date, End_Date, Status, "
        "Upload_Limit, Uploads_Used, Amount_Paid, Payment_Method, User_ID) "
        "VALUES ('Pro', date('now'), date('now', '+30 days'), 'Active', "
        "500, 2, 24.99, 'Stripe', 1)")
    db.execute(
        "INSERT INTO subscription (Plan_Type, Start_Date, End_Date, Status, "
        "Upload_Limit, Uploads_Used, Amount_Paid, Payment_Method, User_ID) "
        "VALUES ('Basic', date('now', '-60 days'), date('now', '-30 days'), "
        "'Expired', 100, 100, 9.99, 'Stripe', 2)")
    for rating, ftype, text, rid in ((5, "general", "great tool", None),
                                     (2, "bug", "problem with upload", None),
                                     (4, "result", "good mask", 1)):
        db.execute(
            "INSERT INTO feedback (Rating, Feedback_Type, Feedback_Text, "
            "User_ID, Result_ID) VALUES (%s, %s, %s, %s, %s)",
            (rating, ftype, text, 1, rid))

    app = create_app(db=db, load_model=False,
                     upload_dir=str(tmp_path / "static"),
                     secret_key="t", allow_default_admin=True)
    admin = Client(app)
    st, _ = admin.post("/admin_login", json_body={"email": "a@gmail.com",
                                                  "password": "111"})
    assert st == 200
    return admin


def test_table_browser_formatting(seeded):
    # friendly names (ref valid_tables, app.py:1710-1717)
    st, r = seeded.get("/api/data/users")
    assert st == 200 and r["success"] and r["count"] == 3
    pw = r["data"][0]["Password"]
    assert pw.endswith("*") and set(pw[4:]) == {"*"}
    assert r["table_info"]["display_name"] == "Users"

    st, r = seeded.get("/api/data/subscriptions")
    amounts = {row["Amount_Paid"] for row in r["data"]}
    assert "24.99" in amounts                      # '.2f' formatting
    assert {row["Status"] for row in r["data"]} == {"Active", "Expired"}

    st, r = seeded.get("/api/data/images")
    assert all(row["file_size"].endswith(".0") for row in r["data"])

    st, r = seeded.get("/api/data/admin")
    assert r["data"][0]["Salary"] == "100,000.00"  # ',.2f'
    assert set(r["data"][0]["Password"][4:]) <= {"*"}

    st, r = seeded.get("/api/data/nope")
    assert st == 403 and "valid_tables" in r


def test_stats_overview(seeded):
    st, r = seeded.get("/api/stats/overview")
    assert st == 200 and r["success"]
    s = r["stats"]
    assert s["total_users"] == 3 and s["total_images"] == 5
    assert s["active_subscriptions"] == 1
    assert s["total_revenue"] == pytest.approx(24.99)
    assert s["recent_uploads"] == 5
    assert s["avg_rating"] == pytest.approx(3.7, abs=0.05)


def test_user_analytics(seeded):
    st, r = seeded.get("/api/analytics/users")
    assert st == 200
    assert sum(x["count"] for x in r["registration_trend"]) == 3
    levels = {x["level"]: x["count"] for x in r["activity_levels"]}
    assert levels == {"Inactive": 1, "Low Activity": 2}
    lengths = {x["length"]: x["count"] for x in r["name_lengths"]}
    assert lengths["1-5 chars"] == 1     # "User0"


def test_image_analytics(seeded):
    st, r = seeded.get("/api/analytics/images")
    types = {x["type"]: x["count"] for x in r["file_types"]}
    assert types == {"JPG": 3, "PNG": 2}
    sizes = {x["range"]: x["count"] for x in r["size_distribution"]}
    assert sizes["< 100 KB"] == 1 and sizes["500KB-1MB"] == 2
    assert sum(x["count"] for x in r["hourly_pattern"]) == 5


def test_result_analytics(seeded):
    st, r = seeded.get("/api/analytics/results")
    colors = {x["color"]: x["count"] for x in r["color_distribution"]}
    assert colors == {"Red": 2, "Blue": 3}
    assert sum(x["count"] for x in r["processing_trend"]) == 5
    assert all({"file_type", "color", "count"} <= set(x)
               for x in r["correlation_data"])


def test_subscription_analytics(seeded):
    st, r = seeded.get("/api/analytics/subscriptions")
    plans = {x["plan"]: x for x in r["plan_distribution"]}
    assert list(plans) == ["Pro"]        # active-only (ref app.py:2100)
    assert plans["Pro"]["revenue"] == pytest.approx(24.99)
    assert len(r["revenue_trend"]) == 2
    durations = {x["duration"]: x["count"] for x in r["duration_analysis"]}
    assert durations == {"Monthly": 2}


def test_feedback_analytics(seeded):
    st, r = seeded.get("/api/feedback/analytics")
    s = r["stats"]
    assert s["total"] == 3
    assert s["types"]["bug"] == 1 and s["types"]["result"] == 1
    assert s["general"] == 2 and s["result"] == 1
    assert s["sentiment"] == {"positive": 2, "negative": 1, "neutral": 0}
    assert s["ratings"][4] == {"rating": 5, "count": 1}
    assert r["trend"] == []


def test_feedback_general_vs_result(seeded):
    st, r = seeded.get("/api/feedback/general")
    d = r["data"]
    assert d["count"] == 2 and d["types"]["bug"] == 1
    assert sum(x["count"] for x in d["trend"]) == 2
    st, r = seeded.get("/api/feedback/result")
    d = r["data"]
    assert d["count"] == 1 and d["types"]["result"] == 1
    assert d["avg_rating"] == pytest.approx(4.0)


def test_admin_analytics_and_profile(seeded):
    st, r = seeded.get("/api/analytics/admin")
    assert r["admin_profile"]["email"] == "a@gmail.com"
    m = r["system_metrics"]
    assert m["processing_efficiency"] == 100.0
    st, r = seeded.get("/api/admin_data")
    assert st == 200 and r["name"] == "Admin"


def test_raw_stats(seeded):
    st, r = seeded.get("/api/stats")
    assert r["stats"] == {"user_management": 3, "image": 5, "result": 5,
                          "subscription": 2, "feedback": 3, "admin": 1}


def test_visualize_table(seeded):
    st, r = seeded.get("/api/visualize/images")
    assert r["success"] and r["label"]
    assert sum(r["counts"]) <= 5
    st, r = seeded.get("/api/visualize/bogus")
    assert r["success"] is False


def test_visualization_user_stats(seeded):
    st, r = seeded.get("/api/visualization/user_stats")
    assert r["total_users"] == 3
    act = {x["level"]: x["count"] for x in r["user_activity"]}
    assert act == {"No Uploads": 1, "2-5 Uploads": 2}
    subs = {x["status"]: x["count"] for x in r["subscription_status"]}
    assert subs["Active Subscription"] == 1
    assert subs["No Subscription"] == 1


def test_visualization_image_stats(seeded):
    st, r = seeded.get("/api/visualization/image_stats")
    assert r["total_images"] == 5
    assert r["avg_file_size"] == pytest.approx(450.0)
    assert all(" " in x["date"] for x in r["uploads"])   # '%b %d'
    act = {x["level"]: x["count"] for x in r["user_activity"]}
    assert act == {"2-5 Uploads": 2}


def test_visualization_subscription_stats(seeded):
    st, r = seeded.get("/api/visualization/subscription_stats")
    assert r["total_revenue"] == pytest.approx(24.99)
    assert [s["plan"] for s in r["subscriptions"]] == ["Pro"]
    assert len(r["trend"]) == 2


def test_visualization_result_stats(seeded):
    st, r = seeded.get("/api/visualization/result_stats")
    assert r["success_rate"] == 100.0
    assert r["total_processed"] == 5
    colors = {x["color"] for x in r["colors"]}
    assert colors == {"Red", "Blue"}
    assert len(r["peak_hours"]) >= 1


def test_visualization_feedback_stats(seeded):
    st, r = seeded.get("/api/visualization/feedback_stats")
    assert {x["type"] for x in r["feedback_types"]} == {"general", "bug",
                                                        "result"}
    assert r["sentiment"]["positive"] == 2
    words = {w["word"] for w in r["word_stats"]}
    assert "great" in words or "good" in words


def test_visualization_result_data(seeded):
    st, r = seeded.get("/api/visualization/result_data")
    assert r["success_rate"] == 100.0
    assert {x["name"] for x in r["color_data"]} == {"Red", "Blue"}
    sizes = {x["name"]: x["count"] for x in r["size_data"]}
    assert sizes["< 100 KB"] == 1        # "Size: 50.00 KB" parse
    assert sum(x["count"] for x in r["processing_trend"]) == 5


def test_user_name_lengths(seeded):
    st, r = seeded.get("/api/user_name_lengths")
    assert sum(x["count"] for x in r["data"]) == 3


def test_recent_user_scoped_endpoints(seeded):
    """/get_recent_* are user-scoped (ref app.py:2617-2664)."""
    c = Client(seeded.app)
    st, _ = c.get("/get_recent_uploaded_times")
    assert st == 401 or st == 302
    c.post("/user_login", json_body={"email": "u0@x.com", "password": "pw"})
    st, r = c.get("/get_recent_uploaded_times")
    assert st == 200 and len(r["timestamps"]) == 3   # LIMIT 3
    st, r = c.get("/get_recent_results")
    assert st == 200 and len(r["results"]) == 3      # user 1 has 3 results


def test_result_feedback_submission(seeded):
    """'result'-type feedback resolves the most recent Result_ID and
    rejects foreign result ids (ref app.py:2701-2735)."""
    c = Client(seeded.app)
    c.post("/user_login", json_body={"email": "u0@x.com", "password": "pw"})
    st, r = c.post("/submit_feedback",
                   json_body={"Feedback_Type": "result", "rating": 5,
                              "Feedback_Text": "sharp edges"})
    assert st == 200 and r["success"]
    st, r = c.get("/get_feedback")
    assert r["data"][0]["Result_ID"] is not None
    # a result belonging to user 2 is rejected
    st, r = c.post("/submit_feedback",
                   json_body={"Feedback_Type": "result", "rating": 4,
                              "Feedback_Text": "x", "result_id": 2})
    assert st == 400
    st, r = c.post("/submit_feedback",
                   json_body={"Feedback_Type": "nonsense", "rating": 4,
                              "Feedback_Text": "x"})
    assert st == 400


def test_analytics_require_login(seeded):
    anon = Client(seeded.app)
    for path in ("/api/stats/overview", "/api/analytics/users",
                 "/api/visualization/image_stats", "/api/stats"):
        st, _ = anon.get(path)
        assert st == 401, path
    st, _ = anon.get("/api/data/users")
    assert st == 401
