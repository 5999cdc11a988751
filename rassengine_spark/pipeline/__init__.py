"""End-to-end pipelines (SURVEY.md §3): the /ask query lifecycle and the
batch ingestion job, composed from sources/ + ml/ + operators/."""
