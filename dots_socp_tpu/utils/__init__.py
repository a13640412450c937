"""Host-side utilities: typed contracts, running history, validators, evaluation."""
