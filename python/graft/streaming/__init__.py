"""PySpark wrappers for graft's streaming estimators.

This module path mirrors the JVM package ``graft.streaming`` so Spark
ML's cross-language class mapping — pyspark derives the Java class name
from the Python module path (and vice versa for ``_from_java``) — works
for save/load and Pipeline persistence without overrides.
"""

from typing import Any, List, Optional

from pyspark import keyword_only
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import JavaMLReadable, JavaMLWritable
from pyspark.ml.wrapper import JavaEstimator
from pyspark.sql import DataFrame

from graft.clustering import GeneralizedKMeansModel, _GeneralizedKMeansParams

__all__ = ["StreamingKMeans", "StreamingKMeansModel"]


class StreamingKMeans(
    JavaEstimator, _GeneralizedKMeansParams, JavaMLReadable, JavaMLWritable
):
    """Streaming k-means with exponential forgetting: batch-fit the
    initial centers, then keep updating them from micro-batches
    (``model.update``) or a whole stream (``model.updateOn``)."""

    decayFactor = Param(
        Params._dummy(), "decayFactor",
        "exponential forgetting factor in [0, 1]; 1.0 = never forget",
        typeConverter=TypeConverters.toFloat,
    )
    timeUnit = Param(
        Params._dummy(), "timeUnit", "batches|points",
        typeConverter=TypeConverters.toString,
    )
    halfLife = Param(
        Params._dummy(), "halfLife",
        "half-life in timeUnit units; overrides decayFactor when set",
        typeConverter=TypeConverters.toFloat,
    )

    @keyword_only
    def __init__(
        self,
        *,
        featuresCol: str = "features",
        predictionCol: str = "prediction",
        k: int = 2,
        divergence: str = "squaredEuclidean",
        smoothing: float = 1e-10,
        maxIter: int = 20,
        tol: float = 1e-4,
        seed: Optional[int] = None,
        decayFactor: float = 1.0,
        timeUnit: str = "batches",
        halfLife: Optional[float] = None,
        weightCol: Optional[str] = None,
    ):
        super(StreamingKMeans, self).__init__()
        self._java_obj = self._new_java_obj(
            "graft.streaming.StreamingKMeans", self.uid
        )
        self._setDefault(
            k=2, divergence="squaredEuclidean", smoothing=1e-10, maxIter=20,
            tol=1e-4, decayFactor=1.0, timeUnit="batches",
        )
        kwargs = self._input_kwargs
        self.setParams(**{k_: v for k_, v in kwargs.items() if v is not None})

    @keyword_only
    def setParams(self, **kwargs: Any) -> "StreamingKMeans":
        return self._set(**self._input_kwargs)

    def setK(self, value: int) -> "StreamingKMeans":
        return self._set(k=value)

    def setDecayFactor(self, value: float) -> "StreamingKMeans":
        return self._set(decayFactor=value)

    def setTimeUnit(self, value: str) -> "StreamingKMeans":
        return self._set(timeUnit=value)

    def setHalfLife(self, value: float) -> "StreamingKMeans":
        return self._set(halfLife=value)

    def getDecayFactor(self) -> float:
        return self.getOrDefault(self.decayFactor)

    def getTimeUnit(self) -> str:
        return self.getOrDefault(self.timeUnit)

    def _create_model(self, java_model: Any) -> "StreamingKMeansModel":
        return StreamingKMeansModel(java_model)


class StreamingKMeansModel(GeneralizedKMeansModel):
    """Mutable streaming model: ``transform`` always scores against an
    immutable snapshot of the CURRENT centers; ``update`` folds in one
    mini-batch with the configured decay."""

    def update(self, batch: DataFrame) -> "StreamingKMeansModel":
        """Fold one mini-batch into the centers (safe from foreachBatch)."""
        self._call_java("update", batch)
        return self

    def currentCenters(self) -> List[List[float]]:
        """Snapshot of the current (possibly updated) centers."""
        return [[float(x) for x in jc] for jc in self._java_obj.currentCenters()]

    def clusterWeights(self) -> List[float]:
        return [float(x) for x in self._java_obj.clusterWeights()]
