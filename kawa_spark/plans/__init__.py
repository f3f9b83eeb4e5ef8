from kawa_spark.plans.audit import audit_plan

__all__ = ["audit_plan"]
