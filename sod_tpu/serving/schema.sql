-- SOD persistence schema (sqlite dialect).
-- Translated from the reference MySQL dump (ref sod.sql:33-165): same
-- tables/columns; MySQL enums become CHECK constraints, AUTO_INCREMENT
-- becomes AUTOINCREMENT.

CREATE TABLE IF NOT EXISTS user_management (
  User_ID   INTEGER PRIMARY KEY AUTOINCREMENT,
  Name      VARCHAR(100),
  Email     VARCHAR(100) UNIQUE,
  Password  VARCHAR(255),
  Phone     VARCHAR(20),
  -- Not in the reference dump (sod.sql:154-165) but required by its own
  -- analytics queries (ref app.py:1744,1891) -- the ref endpoints 500
  -- against the shipped schema; we add the column so they work.
  created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
);

CREATE TABLE IF NOT EXISTS admin (
  Admin_ID  INTEGER PRIMARY KEY AUTOINCREMENT,
  Name      VARCHAR(100),
  Email     VARCHAR(100) UNIQUE,
  Password  VARCHAR(100),
  Salary    INTEGER
);

CREATE TABLE IF NOT EXISTS image (
  image_id        INTEGER PRIMARY KEY AUTOINCREMENT,
  uploaded_image  VARCHAR(255),
  file_type       VARCHAR(10),
  file_size       INTEGER,
  user_id         INTEGER REFERENCES user_management(User_ID),
  -- required by ref analytics (app.py:1756,1955,2617)
  uploaded_at     TIMESTAMP DEFAULT CURRENT_TIMESTAMP
);

CREATE TABLE IF NOT EXISTS result (
  Result_ID    INTEGER PRIMARY KEY AUTOINCREMENT,
  Result_data  TEXT,
  Image_ID     INTEGER REFERENCES image(image_id),
  User_ID      INTEGER REFERENCES user_management(User_ID),
  -- required by ref analytics (app.py:1763,2043,2643)
  processed_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
);

CREATE TABLE IF NOT EXISTS subscription (
  Subscription_ID INTEGER PRIMARY KEY AUTOINCREMENT,
  Plan_Type       TEXT NOT NULL CHECK (Plan_Type IN ('Basic','Pro','Enterprise')),
  Start_Date      DATE,
  End_Date        DATE,
  Status          TEXT DEFAULT 'Active' CHECK (Status IN ('Active','Expired','Canceled')),
  Upload_Limit    INTEGER,
  Uploads_Used    INTEGER DEFAULT 0,
  Amount_Paid     DECIMAL(10,2),
  Payment_Method  TEXT NOT NULL CHECK (Payment_Method IN ('Credit Card','Debit Card','Stripe')),
  User_ID         INTEGER NOT NULL REFERENCES user_management(User_ID),
  -- one-shot payment confirmation: a checkout session id can create at
  -- most one subscription (fixes the ref's replayable /payment-success,
  -- app.py:3101-3182)
  Session_ID      VARCHAR(255)
);

CREATE TABLE IF NOT EXISTS feedback (
  Feedback_ID    INTEGER PRIMARY KEY AUTOINCREMENT,
  Rating         INTEGER,
  Feedback_Type  VARCHAR(50),
  Feedback_Text  TEXT,
  User_ID        INTEGER REFERENCES user_management(User_ID),
  -- ref analytics split general vs per-result feedback on Result_ID and
  -- trend on created_at (app.py:2349-2492) -- columns absent from the
  -- shipped dump; added so those endpoints work
  Result_ID      INTEGER REFERENCES result(Result_ID),
  created_at     TIMESTAMP DEFAULT CURRENT_TIMESTAMP
);

CREATE INDEX IF NOT EXISTS idx_image_user ON image(user_id);
CREATE INDEX IF NOT EXISTS idx_result_image ON result(Image_ID);
CREATE INDEX IF NOT EXISTS idx_result_user ON result(User_ID);
CREATE INDEX IF NOT EXISTS idx_sub_user ON subscription(User_ID);
CREATE INDEX IF NOT EXISTS idx_feedback_user ON feedback(User_ID);

-- NOTE: idx_sub_session (unique Session_ID) is created by
-- Database._migrate() AFTER column migration -- creating it here would
-- crash on pre-round-2 databases whose subscription table lacks the
-- column (executescript runs before the ALTERs).
