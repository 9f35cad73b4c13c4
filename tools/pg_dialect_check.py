"""Execute the engine's PostgreSQL surface against a REAL PostgreSQL
server via psql (VERDICT r4 #8).

The container ships PostgreSQL 15 binaries but no JDBC driver jar and
no psycopg2, so the Spark-JDBC-to-Postgres path itself cannot run
here (it is Derby-proven end-to-end in tests/test_jdbc_integration.py
and env-gated for live PG). What CAN run — and what this tool does —
is the residual risk the Derby work left open: the POSTGRES DIALECT
of everything the engine generates.

Executed against a throwaway local server (initdb'd under /tmp, run
as `nobody`, unix socket):
1. `ensure_schema_sql` (S4 DDL),
2. `postgres_ddl_for` on the REAL loan_final / customers / loans
   Spark schemas (the CREATE TABLE Spark's PostgresDialect would
   emit, incl. NUMERIC(p,s) decimals),
3. data load via COPY from the actual sf0.001 pipeline output,
4. the reference's extraction join (`CUSTOMER_LOAN_JOIN_SQL`,
   /root/reference/main.py:25-39) with row-count + spot-value
   verification against the Spark side,
5. the truncate-overwrite pattern (TRUNCATE + reload + recount).

Usage: python tools/pg_dialect_check.py
       (starts its own server if none is listening; stops it after)
"""

from __future__ import annotations

import csv
import io
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

PGDATA_ROOT = "/tmp/sg_pg_dialect"
PORT = "54329"
SOCK = PGDATA_ROOT
USER = "sg"
SF = "/root/testdata/sf0.001"


def _psql(sql: str, input_data: str | None = None) -> str:
    cmd = [
        "psql", "-h", SOCK, "-p", PORT, "-U", USER, "-d", "postgres",
        "-v", "ON_ERROR_STOP=1", "-qAt", "-c", sql,
    ]
    out = subprocess.run(
        cmd, input=input_data, capture_output=True, text=True
    )
    if out.returncode != 0:
        raise RuntimeError(f"psql failed for {sql!r}:\n{out.stderr}")
    return out.stdout.strip()


def _server_up() -> bool:
    try:
        _psql("SELECT 1")
        return True
    except (RuntimeError, OSError):
        return False


def _start_server() -> bool:
    subprocess.run(["rm", "-rf", PGDATA_ROOT])
    os.makedirs(PGDATA_ROOT, exist_ok=True)
    subprocess.run(["chown", "nobody", PGDATA_ROOT], check=True)
    r = subprocess.run(
        ["su", "nobody", "-s", "/bin/bash", "-c",
         f"cd /tmp && /usr/local/bin/initdb -D {PGDATA_ROOT}/data "
         f"-A trust -U {USER}"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        print("initdb failed:", r.stderr[-500:])
        return False
    r = subprocess.run(
        ["su", "nobody", "-s", "/bin/bash", "-c",
         f"cd /tmp && /usr/local/bin/pg_ctl -D {PGDATA_ROOT}/data "
         f"-l {PGDATA_ROOT}/log -o '-p {PORT} -k {SOCK} "
         f"-c listen_addresses=' start"],
        capture_output=True, text=True,
    )
    if r.returncode != 0:
        print("pg_ctl failed:", r.stderr[-500:])
        return False
    return _server_up()


def _stop_server() -> None:
    subprocess.run(
        ["su", "nobody", "-s", "/bin/bash", "-c",
         f"cd /tmp && /usr/local/bin/pg_ctl -D {PGDATA_ROOT}/data stop"],
        capture_output=True, text=True,
    )


def _copy_in(table: str, df) -> int:
    rows = df.collect()
    buf = io.StringIO()
    w = csv.writer(buf)
    for r in rows:
        w.writerow(["\\N" if v is None else v for v in r])
    _psql(
        f"COPY {table} FROM STDIN WITH (FORMAT csv, NULL '\\N')",
        input_data=buf.getvalue(),
    )
    return len(rows)


def main() -> int:
    if not os.path.exists("/usr/local/bin/initdb"):
        print("SKIP: no PostgreSQL binaries in this environment")
        return 0
    started = False
    if not _server_up():
        if not _start_server():
            print("SKIP: could not start a local PostgreSQL server")
            return 0
        started = True
    try:
        from etl_portfolio_project_spark.pipelines import loan_pipeline
        from etl_portfolio_project_spark.session import get_spark
        from etl_portfolio_project_spark.sources import jdbc, views

        spark = get_spark(app_name="pg_dialect_check")
        print("server:", _psql("SELECT version()").split(" on ")[0])

        # 1. S4 schema DDL
        _psql("DROP SCHEMA IF EXISTS loan_mgmt CASCADE")
        _psql("DROP SCHEMA IF EXISTS customer_mgmt CASCADE")
        _psql("DROP SCHEMA IF EXISTS loan_data CASCADE")
        for sch in ("loan_mgmt", "customer_mgmt", "loan_data"):
            _psql(jdbc.ensure_schema_sql(sch))
        print("[ok] ensure_schema_sql x3")

        # 2+3. CREATE TABLE from real Spark schemas + COPY loads
        # the REFERENCE's customers table carries a loan_id column
        # (its join is ON c.loan_id = l.loan_id,
        # /root/reference/main.py:25-39) — build that exact shape
        loans = views.loans(spark, SF)
        cust = views.customers(spark, SF).join(
            loans.select("loan_id", "customer_id"), "customer_id"
        )
        final = loan_pipeline.loan_final(spark, SF)
        for tbl, df in [
            ("customer_mgmt.customers", cust),
            ("loan_mgmt.loans", loans),
            ("loan_data.loan_final", final),
        ]:
            _psql(jdbc.postgres_ddl_for(df, tbl))
            n = _copy_in(tbl, df)
            back = int(_psql(f"SELECT count(*) FROM {tbl}"))
            assert back == n, (tbl, back, n)
            print(f"[ok] {tbl}: DDL + COPY + count {n}")

        # 4. the reference extraction join, executed BY POSTGRES
        join_sql = jdbc.CUSTOMER_LOAN_JOIN_SQL.format(
            customers_schema="customer_mgmt", loans_schema="loan_mgmt"
        )
        pg_n = int(_psql(f"SELECT count(*) FROM ({join_sql}) s"))
        spark_n = cust.drop("customer_id").join(
            loans, "loan_id"
        ).count()
        assert pg_n == spark_n, (pg_n, spark_n)
        pg_sum = _psql(
            f"SELECT sum(disbursement_amount) FROM ({join_sql}) s"
        )
        print(f"[ok] CUSTOMER_LOAN_JOIN_SQL: {pg_n} rows "
              f"(= Spark), sum(disbursement)={pg_sum}")

        # 5. truncate-overwrite pattern
        _psql("TRUNCATE TABLE loan_data.loan_final")
        assert int(_psql("SELECT count(*) FROM loan_data.loan_final")) == 0
        n = _copy_in("loan_data.loan_final", final)
        assert int(_psql("SELECT count(*) FROM loan_data.loan_final")) == n
        print(f"[ok] truncate-overwrite round trip ({n} rows)")

        spark.stop()
        print("\nPG DIALECT CHECK GREEN (PostgreSQL "
              + _psql("SHOW server_version") + ")")
        return 0
    finally:
        if started:
            _stop_server()


if __name__ == "__main__":
    sys.exit(main())
