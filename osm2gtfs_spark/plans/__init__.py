"""Logical plans: driver-contract queries + the GTFS pipeline."""
