"""Physical-plan introspection & audits — the 100 TB design rules
(pushdown reaches the scan, projections prune, small dims broadcast,
expressions stay in WholeStageCodegen) as checkable assertions rather
than hopes. See :mod:`orderly_spark.plans.audit`."""
