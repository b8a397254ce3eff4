"""Structured Streaming ingestion — the reference's replication path.

TiFlash's only stream is ingestion: Raft log apply → KV decode →
DeltaMergeStore::write (SURVEY.md §1.6). Here: readStream → foreachBatch
append into the MVCC upsert log (sources/delta_store.py), giving the same
"continuously replicated, snapshot-consistent reads" behavior.
"""
