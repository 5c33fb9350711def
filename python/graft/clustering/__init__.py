"""PySpark wrappers for graft's clustering estimators.

Thin ``JavaEstimator``/``JavaModel`` shims over the Scala classes — all
compute stays on the JVM as Catalyst dataflow; Python only carries params
and results. Param names match the Scala side one-for-one, so code written
against the Scala API ports directly.

Reference surface: the upstream project ships an equivalent package
(reference python/massivedatascience/clusterer/kmeans.py); this package
covers the same user workflow (fit / transform / predict / computeCost /
summary / save / load) over graft's estimators.
"""

from typing import Any, List, Optional

from pyspark import keyword_only
from pyspark.ml.linalg import Vector
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasFeaturesCol,
    HasMaxIter,
    HasPredictionCol,
    HasSeed,
    HasTol,
    HasWeightCol,
)
from pyspark.ml.util import JavaMLReadable, JavaMLWritable
from pyspark.ml.wrapper import JavaEstimator, JavaModel
from pyspark.sql import DataFrame

__all__ = ["GeneralizedKMeans", "GeneralizedKMeansModel", "TrainingSummary"]


class _GeneralizedKMeansParams(
    HasFeaturesCol, HasPredictionCol, HasMaxIter, HasSeed, HasTol, HasWeightCol
):
    """Params shared by the estimator and the model (name-compatible with
    the Scala ``GeneralizedKMeansParams`` trait)."""

    k = Param(
        Params._dummy(),
        "k",
        "number of clusters (> 1)",
        typeConverter=TypeConverters.toInt,
    )
    divergence = Param(
        Params._dummy(),
        "divergence",
        "divergence name: squaredEuclidean|kl|itakuraSaito|generalizedI|"
        "logistic|l1|spherical",
        typeConverter=TypeConverters.toString,
    )
    smoothing = Param(
        Params._dummy(),
        "smoothing",
        "epsilon smoothing for log-domain divergences",
        typeConverter=TypeConverters.toFloat,
    )
    initMode = Param(
        Params._dummy(),
        "initMode",
        "k-means|| or random",
        typeConverter=TypeConverters.toString,
    )
    initSteps = Param(
        Params._dummy(),
        "initSteps",
        "k-means|| rounds",
        typeConverter=TypeConverters.toInt,
    )
    assignmentStrategy = Param(
        Params._dummy(),
        "assignmentStrategy",
        "auto|broadcast|expression|elkan|hamerly",
        typeConverter=TypeConverters.toString,
    )
    emptyClusterStrategy = Param(
        Params._dummy(),
        "emptyClusterStrategy",
        "reseedRandom|drop",
        typeConverter=TypeConverters.toString,
    )
    checkpointInterval = Param(
        Params._dummy(),
        "checkpointInterval",
        "iterations between lineage checkpoints",
        typeConverter=TypeConverters.toInt,
    )
    distanceCol = Param(
        Params._dummy(),
        "distanceCol",
        "optional output column with divergence to assigned center",
        typeConverter=TypeConverters.toString,
    )

    def getK(self) -> int:
        return self.getOrDefault(self.k)

    def getDivergence(self) -> str:
        return self.getOrDefault(self.divergence)

    def getSmoothing(self) -> float:
        return self.getOrDefault(self.smoothing)

    def getInitMode(self) -> str:
        return self.getOrDefault(self.initMode)

    def getInitSteps(self) -> int:
        return self.getOrDefault(self.initSteps)

    def getAssignmentStrategy(self) -> str:
        return self.getOrDefault(self.assignmentStrategy)

    def getEmptyClusterStrategy(self) -> str:
        return self.getOrDefault(self.emptyClusterStrategy)

    def getDistanceCol(self) -> str:
        return self.getOrDefault(self.distanceCol)


class GeneralizedKMeans(
    JavaEstimator, _GeneralizedKMeansParams, JavaMLReadable, JavaMLWritable
):
    """K-means generalized to Bregman divergences.

    Example
    -------
    >>> from pyspark.ml.linalg import Vectors
    >>> df = spark.createDataFrame(
    ...     [(Vectors.dense([0.0, 0.0]),), (Vectors.dense([10.0, 10.0]),)],
    ...     ["features"])
    >>> km = GeneralizedKMeans(k=2, divergence="squaredEuclidean")
    >>> model = km.fit(df)
    >>> model.transform(df).select("prediction").distinct().count()
    2
    """

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
        initMode: str = "k-means||",
        initSteps: int = 2,
        assignmentStrategy: str = "auto",
        emptyClusterStrategy: str = "reseedRandom",
        checkpointInterval: int = 10,
        distanceCol: str = "",
        weightCol: Optional[str] = None,
    ):
        super(GeneralizedKMeans, self).__init__()
        self._java_obj = self._new_java_obj(
            "graft.clustering.GeneralizedKMeans", self.uid
        )
        self._setDefault(
            k=2,
            divergence="squaredEuclidean",
            smoothing=1e-10,
            maxIter=20,
            tol=1e-4,
            initMode="k-means||",
            initSteps=2,
            assignmentStrategy="auto",
            emptyClusterStrategy="reseedRandom",
            checkpointInterval=10,
            distanceCol="",
        )
        kwargs = self._input_kwargs
        self.setParams(**{k_: v for k_, v in kwargs.items() if v is not None})

    @keyword_only
    def setParams(self, **kwargs: Any) -> "GeneralizedKMeans":
        """Set params, keyword-only; unset params keep their defaults."""
        return self._set(**self._input_kwargs)

    def setK(self, value: int) -> "GeneralizedKMeans":
        return self._set(k=value)

    def setDivergence(self, value: str) -> "GeneralizedKMeans":
        return self._set(divergence=value)

    def setSmoothing(self, value: float) -> "GeneralizedKMeans":
        return self._set(smoothing=value)

    def setMaxIter(self, value: int) -> "GeneralizedKMeans":
        return self._set(maxIter=value)

    def setTol(self, value: float) -> "GeneralizedKMeans":
        return self._set(tol=value)

    def setSeed(self, value: int) -> "GeneralizedKMeans":
        return self._set(seed=value)

    def setInitMode(self, value: str) -> "GeneralizedKMeans":
        return self._set(initMode=value)

    def setInitSteps(self, value: int) -> "GeneralizedKMeans":
        return self._set(initSteps=value)

    def setAssignmentStrategy(self, value: str) -> "GeneralizedKMeans":
        return self._set(assignmentStrategy=value)

    def setEmptyClusterStrategy(self, value: str) -> "GeneralizedKMeans":
        return self._set(emptyClusterStrategy=value)

    def setFeaturesCol(self, value: str) -> "GeneralizedKMeans":
        return self._set(featuresCol=value)

    def setPredictionCol(self, value: str) -> "GeneralizedKMeans":
        return self._set(predictionCol=value)

    def setWeightCol(self, value: str) -> "GeneralizedKMeans":
        return self._set(weightCol=value)

    def setDistanceCol(self, value: str) -> "GeneralizedKMeans":
        return self._set(distanceCol=value)

    def _create_model(self, java_model: Any) -> "GeneralizedKMeansModel":
        return GeneralizedKMeansModel(java_model)


class GeneralizedKMeansModel(
    JavaModel, _GeneralizedKMeansParams, JavaMLReadable, JavaMLWritable
):
    """Model fitted by :class:`GeneralizedKMeans`.

    ``transform`` appends the prediction column (and ``distanceCol`` when
    set) as a distributed Catalyst plan; ``predict`` scores one vector on
    the driver; ``computeCost`` is the dataset WCSS under the model's
    divergence.
    """

    def clusterCenters(self) -> List[List[float]]:
        """Cluster centers as a list of k vectors (row-major)."""
        # read the double[][] through py4j directly: pyspark's _java2py
        # pickle bridge handles Vector but not nested primitive arrays
        return [[float(x) for x in jc] for jc in self._java_obj.clusterCenters()]

    @property
    def numClusters(self) -> int:
        return self._call_java("numClusters")

    @property
    def numFeatures(self) -> int:
        return self._call_java("numFeatures")

    def predict(self, value: Vector) -> int:
        """Cluster id for a single feature vector."""
        return self._call_java("predict", value)

    def computeCost(self, dataset: DataFrame) -> float:
        """Sum over rows of the divergence to the nearest center."""
        return self._call_java("computeCost", dataset)

    def hasSummary(self) -> bool:
        return self._call_java("hasSummary")

    @property
    def summary(self) -> "TrainingSummary":
        """Training telemetry (raises if the model was loaded, not fit)."""
        return TrainingSummary(self._call_java("summary"))


class TrainingSummary:
    """Eager snapshot of the Scala ``TrainingSummary`` case class."""

    def __init__(self, java_summary: Any):
        self.algorithm: str = java_summary.algorithm()
        self.k: int = java_summary.k()
        self.effectiveK: int = java_summary.effectiveK()
        self.dim: int = java_summary.dim()
        self.numPoints: int = java_summary.numPoints()
        self.iterations: int = java_summary.iterations()
        self.converged: bool = java_summary.converged()
        self.divergence: str = java_summary.divergence()
        self.elapsedMillis: int = java_summary.elapsedMillis()
        self.finalDistortion: float = java_summary.finalDistortion()
        self.avgIterationMillis: float = java_summary.avgIterationMillis()

    def __repr__(self) -> str:
        return (
            f"TrainingSummary(algorithm={self.algorithm!r}, k={self.k}, "
            f"effectiveK={self.effectiveK}, iterations={self.iterations}, "
            f"converged={self.converged}, "
            f"finalDistortion={self.finalDistortion:.6g})"
        )
