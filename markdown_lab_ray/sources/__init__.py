"""Sources: synthetic deterministic web corpus + IO helpers."""
