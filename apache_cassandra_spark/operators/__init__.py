"""Operator modules: read (§2.1), write (§2.2), maintenance (§2.5),
exists (fork probes).

No eager submodule imports here: ``maintenance`` depends on
``sources.cellstore`` which depends on ``operators.write`` — an eager
import would make the package import-order-sensitive (circular).
``from apache_cassandra_spark.operators import read`` etc. works without
them being named here.
"""
