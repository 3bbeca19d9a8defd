WITH RECURSIVE reach(pk) AS (
  SELECT p_partkey AS pk FROM part WHERE p_partkey < 50
  UNION
  SELECT e.b AS pk
  FROM reach r, (SELECT l1.l_partkey AS a, l2.l_partkey AS b
                 FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                  AND l1.l_linenumber = 1 AND l2.l_linenumber = 2) e
  WHERE e.a = r.pk
)
SELECT CAST(pk AS BIGINT) AS pk FROM reach
