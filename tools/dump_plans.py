"""Dump ``.explain("formatted")`` for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
Defaults to every headline query when no names are given.  SF_DIR overrides
the dataset (default sf0.1, the bench scale).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

    from lakehouse_sfc_spark.queries.registry import QUERIES
    import lakehouse_sfc_spark.queries  # noqa: F401
    from lakehouse_sfc_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    if not names:
        names = [n for n, s in sorted(QUERIES.items()) if s.headline]
    out_dir = _REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('WholeStageCodegen')} WSCG spans")
    spark.stop()


if __name__ == "__main__":
    main()
