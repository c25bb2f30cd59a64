"""Probe whether an Iceberg runtime is obtainable in this environment, and
record the result (VERDICT r01 item 5: "exercise Iceberg or retire the
claim").

Checks, in order:
1. an iceberg-spark-runtime jar already on the Spark classpath;
2. an importable ``pyiceberg``;
3. network reachability of Maven Central (to fetch the runtime via
   ``spark.jars.packages``).

Exit 0 with "AVAILABLE" if any path works — then wire the catalog configs in
``sketchlib.spark.checkpoint`` and run the Iceberg-backed resume test.
Exit 0 with "UNAVAILABLE" (documented impossibility) otherwise; the
checkpointer's parquet fallback stays the exercised path.

Result as of 2026-08-17 (this sandbox): UNAVAILABLE — no iceberg jar under
$SPARK_HOME/jars, no pyiceberg, and DNS resolution fails (no network), so
the runtime cannot be fetched.  See BENCH/BASELINE.md "Iceberg probe".
"""

import glob
import os
import socket


def main() -> None:
    spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
    jars = glob.glob(os.path.join(spark_home, "jars", "*iceberg*.jar"))
    print(f"iceberg jars on classpath: {jars or 'none'}")
    try:
        import pyiceberg  # noqa: F401
        print("pyiceberg: importable")
        has_py = True
    except ImportError:
        print("pyiceberg: not installed")
        has_py = False
    try:
        socket.getaddrinfo("repo1.maven.org", 443)
        net = True
    except OSError as e:
        net = False
        print(f"maven central DNS: unreachable ({e})")
    if jars or has_py or net:
        print("AVAILABLE — wire spark.sql.catalog configs and run the "
              "Iceberg resume test")
    else:
        print("UNAVAILABLE — parquet checkpoint fallback remains the "
              "exercised path (documented impossibility)")


if __name__ == "__main__":
    main()
