"""hpmc.update — placeholder module; implementations land later this round."""
