"""Device-mesh parallelism: DP batch sharding + TP weight sharding rules."""
