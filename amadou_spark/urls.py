"""Data-path algebra (reference: HdfsUrl, core/.../HdfsUrl.scala:33-59).

A `DataUrl` is a path over local/HDFS/S3/GCS with optional
date-formatted sub-paths — the reference's notion of a partitioned
table location (`root/year=2016/month=08`). We additionally emit
Hive-style `date=YYYY-MM-DD` layouts so Spark's native partition
discovery and partition PRUNING apply when reading the whole root:
manual path-scoping (read one date dir) and Catalyst pruning (read the
root with a date predicate) both work, which is exactly what keeps an
incremental job from scanning 100 TB to process one day.
"""

from __future__ import annotations

from dataclasses import dataclass

from amadou_spark.dates import DateInterval


@dataclass(frozen=True)
class DataUrl:
    url: str
    date_format: str | None = None  # strftime pattern, e.g. "year=%Y/month=%m"

    def __truediv__(self, part: "str | DateInterval") -> "DataUrl":
        if isinstance(part, DateInterval):
            if self.date_format is None:
                part = part.partition_value()
            else:
                part = part.format(self.date_format)
        return DataUrl(f"{self.url.rstrip('/')}/{part}", self.date_format)

    def __str__(self) -> str:
        return self.url

    @property
    def scheme(self) -> str:
        return self.url.split("://", 1)[0] if "://" in self.url else "file"

    def exists(self, spark) -> bool:
        """Filesystem existence probe through Spark's Hadoop FS (works
        for any scheme the session can read: file/hdfs/s3a/gs)."""
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        conf = jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.url)
        return path.getFileSystem(conf).exists(path)
