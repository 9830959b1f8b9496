"""Sources & storage: fixture generators and the snapshot table adapter."""
