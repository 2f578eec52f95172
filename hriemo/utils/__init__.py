"""Utilities: checkpoint I/O (torch bridge + orbax), metrics, config, seeding."""
