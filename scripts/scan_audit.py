"""Audit: how many PHYSICAL corpus scans does each catalog query plan?

A union/join branch that re-reads the same table multiplies full-table
reads at warehouse scale even when the local wall looks fine (the
text_battery lesson, r13: six branches -> six 100 TB scans). This
prints, per catalog query, the number of FileScan nodes per source
table OUTSIDE cached subtrees (each InMemoryRelation print embeds its
own child scan once per InMemoryTableScan reference; those are one
physical scan).

Run: python scripts/scan_audit.py [sf_dir]
"""
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main():
    from solana_event_stream_spark.catalog import release_persisted
    from solana_event_stream_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:            # noqa: BLE001
            rows.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        finally:
            release_persisted()
        lines = plan.splitlines()
        n_imr = sum("InMemoryRelation" in ln for ln in lines)
        per_table: dict[str, int] = {}
        for ln in lines:
            if "FileScan" not in ln:
                continue
            m = re.search(r"\[file:[^\]]*/(\w+)\.parquet", ln)
            tbl = m.group(1) if m else "?"
            per_table[tbl] = per_table.get(tbl, 0) + 1
        total_fs = sum(per_table.values())
        # cached subtrees re-print their scan once per reference
        note = f" (-{n_imr} cached prints)" if n_imr else ""
        flagged = {t: c for t, c in per_table.items() if c > 1}
        if flagged or n_imr:
            rows.append((name, f"{per_table}{note}"))
    print(f"queries with multi-scan tables (of {len(entry.queries())}):")
    for name, info in rows:
        print(f"  {name:40s} {info}")
    spark.stop()


if __name__ == "__main__":
    main()
