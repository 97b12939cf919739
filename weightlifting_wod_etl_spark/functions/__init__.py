"""Scalar expression helpers — all built-in-function compositions (JVM-side,
whole-stage-codegen friendly). No row-at-a-time Python UDFs live here."""
