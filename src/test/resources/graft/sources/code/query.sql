-- count the things
SELECT count(*)
FROM t -- trailing comments don't count
WHERE x > 0;
