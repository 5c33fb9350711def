"""graft — PySpark bindings for the graft Spark-native analytics engine.

The Python package name mirrors the JVM package (``graft.clustering``), so
Spark ML's Java<->Python stage mapping (``JavaParams._from_java`` /
``JavaMLReader._java_loader_class``) resolves both directions with no
overrides: models saved from Python load in Scala and vice versa, and
``Pipeline``/``PipelineModel`` persistence round-trips across languages.

Requires the graft assembly jar on the Spark classpath, e.g.::

    spark = (SparkSession.builder
             .config("spark.jars", "/path/to/graft.jar")
             .getOrCreate())
"""

__version__ = "0.10.0"
