#!/usr/bin/env python3
"""Packaging for the graft PySpark bindings.

The package carries no compute — it is a thin py4j shim over the graft
Scala library, which must be on the Spark classpath (spark.jars).
"""

from setuptools import find_packages, setup
import os

version = None
here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, "graft", "__init__.py")) as f:
    for line in f:
        if line.startswith("__version__"):
            version = line.split("=")[1].strip().strip('"').strip("'")
            break

setup(
    name="graft-spark",
    version=version,
    description="PySpark bindings for the graft Spark-native analytics engine",
    packages=find_packages(include=["graft", "graft.*"]),
    python_requires=">=3.9",
    install_requires=["pyspark>=4.0.0"],
)
