"""Empirical probe: which DataSourceStreamReader methods does Spark
4.x call, in what order, on a RESTART whose final batch was (a)
committed, (b) uncommitted?  Drives the txchanges admission-bound
design — run manually, prints the per-run call log."""

import json
import os
import sys
import tempfile
import time

LOG = tempfile.mktemp(prefix="probe_calls_")
os.environ["PROBE_LOG"] = LOG

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class ProbeReader(DataSourceStreamReader):
    def __init__(self, options):
        self.log_path = options.get("log", LOG)
        self.head = int(options.get("head", "10"))

    def _log(self, what):
        with open(self.log_path, "a") as fh:
            fh.write(json.dumps({"t": time.time(), "call": what}) + "\n")

    def initialOffset(self):
        self._log("initialOffset")
        return {"v": 0}

    def latestOffset(self):
        self._log("latestOffset")
        return {"v": self.head}

    def partitions(self, start, end):
        self._log(f"partitions({start['v']},{end['v']})")
        return [InputPartition(0)]

    def read(self, partition):
        return iter([(1,)])

    def commit(self, end):
        self._log(f"commit({end['v']})")


class ProbeSource(DataSource):
    @classmethod
    def name(cls):
        return "probe_src"

    def schema(self):
        return "x int"

    def streamReader(self, schema):
        return ProbeReader(self.options)


def main():
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .appName("probe")
        .getOrCreate()
    )
    spark.dataSource.register(ProbeSource)
    ckpt = tempfile.mkdtemp(prefix="probe_ckpt_")
    out = tempfile.mkdtemp(prefix="probe_out_")

    def run(label, head, secs):
        open(LOG, "w").close()
        q = (
            spark.readStream.format("probe_src")
            .option("log", LOG).option("head", str(head)).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        time.sleep(secs)
        q.stop()
        print(f"=== {label} ===")
        with open(LOG) as fh:
            for line in fh:
                print("  ", json.loads(line)["call"])
        # checkpoint state
        for d in ("offsets", "commits"):
            p = os.path.join(ckpt, d)
            names = sorted(os.listdir(p)) if os.path.isdir(p) else []
            print(f"  {d}: {names}")

    run("first run (head=10)", 10, 12)
    run("restart (head=20)", 20, 8)
    spark.stop()


if __name__ == "__main__":
    main()
