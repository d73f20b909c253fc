"""Logical plans: the flagship feature pipeline and the query layer."""
