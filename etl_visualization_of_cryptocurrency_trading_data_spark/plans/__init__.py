"""Query plans: serving-route builders + the oracle registry."""
