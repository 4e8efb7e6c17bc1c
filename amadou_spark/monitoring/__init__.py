"""Monitoring: lifecycle events + pluggable messaging (SURVEY §2.1)."""
