#!/bin/sh
# Calm probe: spin 8 threads for 3s and report the steal rate the LOAD
# ITSELF induces (r15 finding: on this host steal is substantially
# self-induced under load — an oversubscription throttle — so an IDLE
# steal reading does not predict a sweep's contamination; only a
# loaded probe does). Output: induced steal ticks/sec. < ~10/s means a
# full-width sweep can pass the 3000-tick gate.
s1=$(grep '^cpu ' /proc/stat | awk '{print $9}')
for i in 1 2 3 4 5 6 7 8; do (timeout 3 sh -c 'while :; do :; done' &) ; done
sleep 4
s2=$(grep '^cpu ' /proc/stat | awk '{print $9}')
echo "$(( (s2 - s1) / 3 ))"
