"""PySpark facade over the graft profiling engine.

Mirrors the reference's whyspark Python API
(/root/reference/spark/python/whyspark/udt/profile.py): a lazy builder
that assembles a JVM-side session through the Py4J gateway and hands back
ordinary PySpark DataFrames. Requires the graft classes (or jar) on the
Spark driver classpath, e.g.::

    SparkSession.builder.config(
        "spark.driver.extraClassPath", "/path/to/graft/classes-or.jar")

All heavy lifting runs in the JVM: one groupBy+agg pass per profile,
sketch-bounded state, no Python-side row traffic.
"""

import os
from datetime import datetime, timezone
from typing import List, Optional

from pyspark.sql import DataFrame

_BRIDGE = "graft.python.PyBridge"


def _jvm_bridge(df: DataFrame):
    return getattr(df.sparkSession._jvm, _BRIDGE)


def _to_py_df(jdf, like: DataFrame) -> DataFrame:
    return DataFrame(jdf, like.sparkSession)


class ModelProfileSpec:
    def __init__(self, kind: str, prediction_field: str, target_field: str,
                 score_field: Optional[str]):
        self.kind = kind  # "classification" | "regression"
        self.prediction_field = prediction_field
        self.target_field = target_field
        self.score_field = score_field


class GraftProfileSession:
    """Builder for a profiling run. Immutable: every with*/groupBy call
    returns a new session, like the reference's WhyProfileSession."""

    def __init__(self, dataframe: DataFrame, name: str,
                 time_column: Optional[str] = None,
                 cadence: Optional[str] = None,
                 group_by_columns: Optional[List[str]] = None,
                 model_profile: Optional[ModelProfileSpec] = None,
                 tags: Optional[dict] = None,
                 flatten_nested: bool = False):
        self._df = dataframe
        self._name = name
        self._time_column = time_column
        self._cadence = cadence
        self._group_by_columns = list(group_by_columns or [])
        self._model_profile = model_profile
        self._tags = dict(tags or {})
        self._flatten_nested = flatten_nested

    def _copy(self, **kw) -> "GraftProfileSession":
        args = dict(
            dataframe=self._df, name=self._name,
            time_column=self._time_column, cadence=self._cadence,
            group_by_columns=self._group_by_columns,
            model_profile=self._model_profile, tags=self._tags,
            flatten_nested=self._flatten_nested)
        args.update(kw)
        return GraftProfileSession(**args)

    def withTimeColumn(self, time_column: str,
                       cadence: Optional[str] = None):  # noqa: N802
        """Bucket profiles by a tumbling window over ``time_column``
        (default cadence 1 day)."""
        return self._copy(time_column=time_column, cadence=cadence)

    def groupBy(self, col: str, *cols: str):  # noqa: N802
        return self._copy(group_by_columns=[col] + list(cols))

    def withClassificationModel(self, prediction_field: str,  # noqa: N802
                                target_field: str,
                                score_field: Optional[str] = None):
        return self._copy(model_profile=ModelProfileSpec(
            "classification", prediction_field, target_field, score_field))

    def withRegressionModel(self, prediction_field: str,  # noqa: N802
                            target_field: str):
        return self._copy(model_profile=ModelProfileSpec(
            "regression", prediction_field, target_field, None))

    def withTag(self, key: str, value: str):  # noqa: N802
        tags = dict(self._tags)
        tags[key] = value
        return self._copy(tags=tags)

    def flattenNested(self):  # noqa: N802
        """Expand nested struct/array/map columns into profile-able
        leaves before aggregation: struct fields become dotted paths
        ("addr.city"), arrays and maps contribute element profiles plus
        a "<name>.size" length profile (elements are tracked in-row by
        the aggregate — no explode). The reference degrades every
        non-primitive value to UNKNOWN; this sees inside."""
        return self._copy(flatten_nested=True)

    def _create_j_session(self):
        bridge = _jvm_bridge(self._df)
        j = bridge.newProfilingSession(self._df._jdf, self._name)
        if self._time_column is not None:
            if self._cadence is not None:
                j = j.withTimeColumn(self._time_column, self._cadence)
            else:
                j = j.withTimeColumn(self._time_column)
        if self._group_by_columns:
            j = j.groupBy(self._group_by_columns)
        mp = self._model_profile
        if mp is not None:
            if mp.kind == "classification":
                j = j.withClassificationModel(
                    mp.prediction_field, mp.target_field,
                    mp.score_field or "")
            else:
                j = j.withRegressionModel(mp.prediction_field, mp.target_field)
        for k, v in self._tags.items():
            j = j.withTag(k, v)
        if self._flatten_nested:
            j = j.flattenNested()
        return j

    def aggProfiles(self, datetime_ts: Optional[datetime] = None,  # noqa: N802
                    timestamp_ms: Optional[int] = None) -> DataFrame:
        """Run the profile aggregation.

        With no timestamp: the typed profile frame (one queryable struct
        per column). With a timestamp (datetime or epoch millis): the
        reference-compatible frame carrying the ``why_profile`` wire-format
        binary column stamped with the session timestamp.
        """
        j = self._create_j_session()
        if datetime_ts is not None:
            timestamp_ms = int(datetime_ts.timestamp() * 1000)
        if timestamp_ms is None:
            return _to_py_df(j.aggProfiles(), self._df)
        return _to_py_df(j.aggProfiles(int(timestamp_ms)), self._df)

    def aggParquet(self, path: str,  # noqa: N802
                   datetime_ts: Optional[datetime] = None,
                   timestamp_ms: Optional[int] = None) -> None:
        """Profile and write to a parquet path."""
        df = self.aggProfiles(datetime_ts=datetime_ts,
                              timestamp_ms=timestamp_ms)
        df.write.parquet(path)

    def log(self, endpoint: Optional[str] = None,
            api_key: Optional[str] = None) -> None:
        """Profile and POST each row's wire profile to an HTTP endpoint
        (``GRAFT_ENDPOINT`` / ``GRAFT_API_KEY`` env fallbacks)."""
        endpoint = endpoint or os.environ.get("GRAFT_ENDPOINT")
        api_key = api_key or os.environ.get("GRAFT_API_KEY", "")
        if endpoint is None:
            raise RuntimeError("Please specify an upload endpoint")
        self._create_j_session().log(endpoint, api_key)


def new_profiling_session(df: DataFrame, name: str,
                          time_column: Optional[str] = None
                          ) -> GraftProfileSession:
    """Entry point mirroring whyspark.new_profiling_session."""
    return GraftProfileSession(df, name, time_column=time_column)


def merge_profiles(profiles: DataFrame,
                   keys: Optional[List[str]] = None) -> DataFrame:
    """Re-aggregate stored profile rows (from aggProfiles) to a coarser
    grouping; ``keys=None`` rolls everything up to one row."""
    bridge = _jvm_bridge(profiles)
    jdf = bridge.mergeProfiles(profiles._jdf, list(keys or []))
    return _to_py_df(jdf, profiles)


def estimate_segments(df: DataFrame, target_field: Optional[str] = None,
                      max_segments: int = 30) -> List[str]:
    """Entropy-based segmentation column selection (whyspark's
    estimate_segments), computed by the Scala engine in one stats pass."""
    bridge = _jvm_bridge(df)
    return list(bridge.estimateSegments(df._jdf, target_field or "",
                                        int(max_segments)))
