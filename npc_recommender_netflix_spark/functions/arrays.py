"""placeholder — filled in later phases."""
