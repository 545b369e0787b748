"""Diagnostic: where does the triangle wedge phase spend its time, and
which stage stops scaling from local[2] -> local[8]?

Runs the exact scaling-bench triangle workload (4.2M-edge synth graph,
32 shuffle partitions, AQE off) at one core count, but times the two
sub-phases separately and dumps per-stage task metrics from the Spark
REST API (straggler detection: max vs median task time per stage).

Usage: python tools/probe_tri_phases.py <cores>
Run once per core count, sequentially (never two JVMs concurrently).
"""
from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from linkgraph.session import get_spark  # noqa: E402
from linkgraph.synth import synth_edge_table  # noqa: E402
from linkgraph.triangles import oriented_edges  # noqa: E402


def stage_report(port: int = 4040) -> list[dict]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete")
    )
    out = []
    for s in stages:
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = json.load(
                urllib.request.urlopen(
                    f"{base}/{app_id}/stages/{sid}/{att}/taskSummary"
                    "?quantiles=0.5,1.0"
                )
            )
            med, mx = q["duration"]
        except Exception:
            med = mx = float("nan")
        out.append(
            {
                "stage": sid,
                "tasks": s["numTasks"],
                "runtime_s": round(s["executorRunTime"] / 1e3, 2),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 2),
                "task_med_s": round(med / 1e3, 2),
                "task_max_s": round(mx / 1e3, 2),
                "shuffle_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "shuffle_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "spill_mb": round(s["diskBytesSpilled"] / 1e6, 1),
                "name": s["name"].split("\n")[0][:70],
            }
        )
    return sorted(out, key=lambda r: r["stage"])


def main() -> None:
    cores = int(sys.argv[1])
    n_edges = 1 << 22
    spark = get_spark(
        f"probe-tri-{cores}",
        cores=cores,
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.adaptive.enabled": "false",
            "spark.ui.enabled": "true",
        },
    )
    edges = synth_edge_table(
        spark, n_nodes=max(1024, n_edges // 8), n_edges=n_edges
    )
    t0 = time.time()
    org, deg, n_oriented = oriented_edges(edges)
    t_orient = time.time() - t0
    print(f"ORIENT {t_orient:.2f}s  ({n_oriented} oriented edges)", flush=True)

    e1 = org.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = org.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    closing = org.select(
        F.col("lo").alias("u"), F.col("hi").alias("w")
    ).hint("shuffle_hash")
    tri = e1.join(e2, "v").join(closing, ["u", "w"], "left_semi")
    per_node = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )

    # phase A: pure wedge pipeline (wedge join + semi + explode +
    # map-side-combined count + tiny sum)
    t0 = time.time()
    s = per_node.agg(F.sum("triangles")).first()[0]
    t_a = time.time() - t0
    print(f"PHASE_A wedge+count {t_a:.2f}s  (sum={s})", flush=True)

    # phase B: the full counting phase exactly as triangle_count runs
    # it (re-runs the wedge pipeline since per_node is not persisted)
    counts = (
        deg.join(per_node, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        )
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
        )
        .persist()
    )
    t0 = time.time()
    agg = counts.agg(
        F.count("*").alias("n"),
        F.avg("coefficient").alias("avg_c"),
        F.sum("triangles").alias("t3"),
    ).first()
    t_b = time.time() - t0
    print(
        f"PHASE_B full counting {t_b:.2f}s  (n={agg['n']}, "
        f"tri={int(agg['t3'] // 3)})",
        flush=True,
    )
    print(f"TOTAL cores={cores} orient={t_orient:.2f} "
          f"A={t_a:.2f} B={t_b:.2f}", flush=True)

    for r in stage_report():
        print("STAGE " + json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
