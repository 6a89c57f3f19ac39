"""``python -m cassaforte_meter_transmission_gen_spark`` — the
reference's ``lein run`` equivalent (core.clj:163-176)."""

from .runner import main

main()
