package graft.psql

import graft.SparkSpec

/** CREATE TABLE constraint clauses (TableConstraints): parse-and-record of
  * PRIMARY KEY / NOT NULL / DEFAULT / CHECK / UNIQUE / FOREIGN KEY (column
  * and table forms), catalog round-trip, DEFAULT fill on the front-end
  * insert paths, NOT NULL + CHECK enforcement with DuckDB's error texts,
  * PRIMARY KEY uniqueness on plain INSERT, and the PK-inferring upserts
  * (INSERT OR REPLACE / OR IGNORE / bare ON CONFLICT). Counts and final
  * contents probed against DuckDB 1.0 executing the SAME statements.
  */
class TableConstraintsSpec extends SparkSpec {

  private lazy val psql = Psql(spark)

  private def drop(name: String): Unit = {
    graft.operators.Bucketing.dropTableAndLocation(spark, name)
    graft.operators.Bucketing.dropTableAndLocation(spark, name + "__graft_cow")
  }

  test("constraints parse, strip, and round-trip through table properties") {
    drop("graft_ct_a")
    psql.sql("""create table graft_ct_a (
      |  i integer primary key,
      |  v varchar not null,
      |  n int default 7,
      |  u double unique,
      |  check (n >= 0),
      |  unique (v, n),
      |  foreign key (n) references other_t (n))""".stripMargin)
    val c = TableConstraints.load(spark, "graft_ct_a")
    assert(c.primaryKey == Seq("i"))
    assert(c.notNull.toSet == Set("v", "i")) // PK implies NOT NULL
    assert(c.uniques.map(_.toList).toSet == Set(List("u"), List("v", "n")))
    assert(c.checks == Seq("n >= 0"))
    assert(c.defaults == Map("n" -> "7"))
    assert(c.foreignKeys.size == 1 && c.foreignKeys.head.contains("other_t"))
    // bare VARCHAR mapped to string; schema records the columns
    val sch = spark.table("graft_ct_a").schema
    assert(sch.fields.map(_.name).toSeq == Seq("i", "v", "n", "u"))
    assert(sch("v").dataType.sql.toLowerCase == "string")
  }

  test("DEFAULT fills unlisted columns; probed DuckDB content parity") {
    drop("graft_ct_b")
    psql.sql("create table graft_ct_b (i integer primary key, v varchar not null, n int default 7)")
    // front-end path (table has constraints): count 1, n takes the default
    val r = psql.sql("insert into graft_ct_b (i, v) values (1, 'a')")
    assert(r.collect()(0).getLong(0) == 1L)
    val row = spark.table("graft_ct_b").collect()(0)
    assert((row.getInt(0), row.getString(1), row.getInt(2)) == ((1, "a", 7)))
  }

  test("NOT NULL and CHECK violations fail with DuckDB's message; nothing is written") {
    drop("graft_ct_c")
    psql.sql("create table graft_ct_c (i integer primary key, v varchar not null, n int default 7, check (n >= 0))")
    psql.sql("insert into graft_ct_c values (1, 'a', 1)")
    val nn = intercept[Exception] {
      psql.sql("insert into graft_ct_c values (2, null, 2)").collect()
    }
    assert(nn.getMessage.contains("NOT NULL constraint failed: graft_ct_c.v"))
    val ck = intercept[Exception] {
      psql.sql("insert into graft_ct_c values (2, 'c', -5)").collect()
    }
    assert(ck.getMessage.contains("CHECK constraint failed: graft_ct_c"))
    // a failing batch must not leave partial rows behind
    assert(spark.table("graft_ct_c").count() == 1L)
  }

  test("PRIMARY KEY uniqueness on plain INSERT: table dup and batch dup error") {
    drop("graft_ct_d")
    psql.sql("create table graft_ct_d (i integer primary key, v varchar)")
    psql.sql("insert into graft_ct_d values (1, 'a')")
    val dup = intercept[IllegalArgumentException] {
      psql.sql("insert into graft_ct_d values (1, 'b')")
    }
    assert(dup.getMessage.contains("violates primary key constraint"))
    val batch = intercept[IllegalArgumentException] {
      psql.sql("insert into graft_ct_d values (5, 'x'), (5, 'y')")
    }
    assert(batch.getMessage.contains("violates primary key constraint"))
    assert(spark.table("graft_ct_d").count() == 1L)
  }

  test("INSERT OR REPLACE / OR IGNORE / bare ON CONFLICT infer the PK (probed DuckDB)") {
    drop("graft_ct_e")
    psql.sql("create table graft_ct_e (i integer primary key, v varchar not null, n int default 7)")
    psql.sql("insert into graft_ct_e (i, v) values (1, 'a')")
    // probed: INSERT OR REPLACE count 1, row becomes (1, z, 9)
    assert(psql.sql("insert or replace into graft_ct_e values (1, 'z', 9)")
      .collect()(0).getLong(0) == 1L)
    // probed: OR IGNORE count 1 (key 1 ignored, key 3 inserted)
    assert(psql.sql("insert or ignore into graft_ct_e values (1, 'q', 3), (3, 'd', 4)")
      .collect()(0).getLong(0) == 1L)
    // probed: bare ON CONFLICT count 1, row 3 updated to v='x' (n kept)
    assert(psql.sql("insert into graft_ct_e values (3, 'x', 5) " +
      "on conflict do update set v = excluded.v").collect()(0).getLong(0) == 1L)
    val rows = spark.table("graft_ct_e").orderBy("i").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, "z", 9), (3, "x", 4)))
    // probed: batch proposing the same key twice errors on BOTH forms
    val e = intercept[IllegalArgumentException] {
      psql.sql("insert or replace into graft_ct_e values (5,'m',1),(5,'n',2)")
    }
    assert(e.getMessage.contains("twice"))
  }

  test("partial-column OR REPLACE keeps UNLISTED columns' OLD values (probed DuckDB)") {
    drop("graft_ct_pr")
    psql.sql("create table graft_ct_pr (k int primary key, v varchar default 'x', n int default 7)")
    psql.sql("insert into graft_ct_pr values (1, 'orig', 99)")
    // probed: (1,'orig',99) + OR REPLACE (k,n)=(1,5) → (1,'orig',5):
    // v keeps the OLD value, NOT the default
    psql.sql("insert or replace into graft_ct_pr (k, n) values (1, 5)")
    val r1 = spark.table("graft_ct_pr").collect()(0)
    assert((r1.getInt(0), r1.getString(1), r1.getInt(2)) == ((1, "orig", 5)))
    // …while a NOT-matched key through the same statement gets defaults
    psql.sql("insert or replace into graft_ct_pr (k, n) values (3, 43)")
    val r3 = spark.table("graft_ct_pr").where("k = 3").collect()(0)
    assert((r3.getString(1), r3.getInt(2)) == (("x", 43)))
    // probed: pk-only column list on an existing key → count 0, unchanged
    assert(psql.sql("insert or replace into graft_ct_pr (k) values (1)")
      .collect()(0).getLong(0) == 0L)
    val r1b = spark.table("graft_ct_pr").where("k = 1").collect()(0)
    assert((r1b.getString(1), r1b.getInt(2)) == (("orig", 5)))
  }

  test("pk-only table: OR REPLACE degenerates to DO NOTHING (probed count 0)") {
    drop("graft_ct_f")
    psql.sql("create table graft_ct_f (i int primary key)")
    assert(psql.sql("insert or replace into graft_ct_f values (1)")
      .collect()(0).getLong(0) == 1L)
    assert(psql.sql("insert or replace into graft_ct_f values (1)")
      .collect()(0).getLong(0) == 0L) // probed DuckDB: [(0,)]
    assert(spark.table("graft_ct_f").count() == 1L)
  }

  test("UPDATE and MERGE-lowered upserts enforce NOT NULL/CHECK (probed DuckDB errors)") {
    drop("graft_ct_g")
    psql.sql("create table graft_ct_g (i integer primary key, v varchar not null, n int default 7, check (n >= 0))")
    psql.sql("insert into graft_ct_g values (1, 'a', 1)")
    val un = intercept[Exception] {
      psql.sql("update graft_ct_g set v = null where i = 1").collect()
    }
    assert(un.getMessage.contains("NOT NULL constraint failed: graft_ct_g.v"))
    val uc = intercept[Exception] {
      psql.sql("update graft_ct_g set n = -1 where i = 1").collect()
    }
    assert(uc.getMessage.contains("CHECK constraint failed"))
    val oc = intercept[Exception] {
      psql.sql("insert into graft_ct_g values (1, 'b', 2) " +
        "on conflict do update set n = -9").collect()
    }
    assert(oc.getMessage.contains("CHECK constraint failed"))
    val row = spark.table("graft_ct_g").collect()(0)
    assert((row.getInt(0), row.getString(1), row.getInt(2)) == ((1, "a", 1)))
  }

  test("CREATE OR REPLACE TABLE with a column-def list drops and recreates") {
    drop("graft_ct_h")
    psql.sql("create table graft_ct_h (i int primary key, v varchar)")
    psql.sql("insert into graft_ct_h values (1, 'a')")
    psql.sql("create or replace table graft_ct_h (k bigint, s varchar default 'd')")
    assert(spark.table("graft_ct_h").columns.toSeq == Seq("k", "s"))
    assert(spark.table("graft_ct_h").count() == 0L)
    assert(TableConstraints.load(spark, "graft_ct_h").defaults == Map("s" -> "'d'"))
  }

  test("IF NOT EXISTS keeps the existing table; duplicate CREATE errors") {
    drop("graft_ct_i")
    psql.sql("create table graft_ct_i (i int primary key)")
    psql.sql("create table if not exists graft_ct_i (j varchar not null)")
    assert(spark.table("graft_ct_i").columns.toSeq == Seq("i"))
    val e = intercept[Exception] {
      psql.sql("create table graft_ct_i (j varchar not null)")
    }
    assert(e.getMessage.toLowerCase.contains("already exists"))
  }

  test("unconstrained CREATE TABLE and plain INSERT stay on Spark's native path") {
    drop("graft_ct_j")
    // no constraints, no OR REPLACE: TableConstraints.create returns None
    psql.sql("create table graft_ct_j (i int, v string) using parquet")
    assert(TableConstraints.load(spark, "graft_ct_j").isEmpty)
    psql.sql("insert into graft_ct_j values (1, 'a')")
    assert(spark.table("graft_ct_j").count() == 1L)
  }

  test("PRAGMA table_info surfaces recorded constraints (probed DuckDB shape)") {
    drop("graft_ct_ti")
    psql.sql("create table graft_ct_ti (i integer primary key, v varchar not null, n int default 7)")
    // probed DuckDB: [(0,'i','INTEGER',True,None,True),(1,'v',...,True,None,False),
    //                 (2,'n',...,False,'7',False)]
    val rows = psql.sql("pragma table_info('graft_ct_ti')").orderBy("cid").collect()
      .map(r => (r.getString(1), r.getBoolean(3),
        if (r.isNullAt(4)) null else r.getString(4), r.getBoolean(5))).toSeq
    assert(rows == Seq(("i", true, null, true), ("v", true, null, false),
      ("n", false, "7", false)))
  }

  test("CREATE [UNIQUE] INDEX: recorded, enforced, dropped; existing dups rejected") {
    drop("graft_ct_ix")
    psql.sql("create table graft_ct_ix (i int primary key, v varchar, n int)")
    psql.sql("insert into graft_ct_ix values (1, 'a', 5), (2, 'b', 6)")
    // plain index: advisory metadata only
    psql.sql("create index graft_v_idx on graft_ct_ix (v)")
    // unique index: a real constraint from now on
    psql.sql("create unique index graft_n_idx on graft_ct_ix (n)")
    assert(TableConstraints.load(spark, "graft_ct_ix").uniques.map(_.toList)
      .contains(List("n")))
    val dup = intercept[IllegalArgumentException] {
      psql.sql("insert into graft_ct_ix values (3, 'c', 5)")
    }
    assert(dup.getMessage.contains("violates unique constraint"), dup.getMessage)
    // NULL keys are exempt (SQL's rule): two NULL n values insert fine
    psql.sql("insert into graft_ct_ix values (3, 'c', null), (4, 'd', null)")
    assert(spark.table("graft_ct_ix").count() == 4L)
    // building a unique index over non-unique existing data errors:
    // v now holds a duplicate ('a' twice) after this insert
    psql.sql("insert into graft_ct_ix values (9, 'a', 7)")
    val pre = intercept[IllegalArgumentException] {
      psql.sql("create unique index graft_v_uidx on graft_ct_ix (v)")
    }
    assert(pre.getMessage.contains("violates unique constraint"), pre.getMessage)
    // duplicate index name; IF NOT EXISTS keeps
    val dn = intercept[IllegalArgumentException] {
      psql.sql("create index graft_n_idx on graft_ct_ix (v)")
    }
    assert(dn.getMessage.contains("already exists"))
    psql.sql("create index if not exists graft_n_idx on graft_ct_ix (v)")
    // DROP INDEX releases the constraint
    psql.sql("drop index graft_n_idx")
    psql.sql("insert into graft_ct_ix values (5, 'e', 5)") // n=5 again: fine now
    assert(spark.table("graft_ct_ix").count() == 6L)
    val gone = intercept[IllegalArgumentException] { psql.sql("drop index graft_n_idx") }
    assert(gone.getMessage.contains("does not exist"))
    psql.sql("drop index if exists graft_n_idx") // no error
    psql.sql("drop index graft_v_idx")
  }

  test("bare DEFAULT keyword in VALUES and UPDATE SET (probed DuckDB)") {
    drop("graft_ct_dk")
    psql.sql("create table graft_ct_dk (i int primary key, v varchar default 'x', n int)")
    // probed: INSERT INTO t VALUES (1, DEFAULT, DEFAULT) → (1, 'x', NULL)
    psql.sql("insert into graft_ct_dk values (1, default, default)")
    val r1 = spark.table("graft_ct_dk").collect()(0)
    assert(r1.getInt(0) == 1 && r1.getString(1) == "x" && r1.isNullAt(2))
    // probed: column-list form INSERT (i, n) VALUES (2, DEFAULT) → n NULL
    psql.sql("insert into graft_ct_dk (i, n) values (2, default)")
    val r2 = spark.table("graft_ct_dk").where("i = 2").collect()(0)
    assert(r2.getString(1) == "x" && r2.isNullAt(2))
    // probed: UPDATE SET v = DEFAULT, n = 5
    psql.sql("update graft_ct_dk set v = default, n = 5 where i = 1")
    val r3 = spark.table("graft_ct_dk").where("i = 1").collect()(0)
    assert(r3.getString(1) == "x" && r3.getInt(2) == 5)
    // a string literal 'default' is DATA, never the keyword
    psql.sql("insert into graft_ct_dk values (3, 'default', default)")
    assert(spark.table("graft_ct_dk").where("i = 3").collect()(0).getString(1) == "default")
  }

  test("CREATE TYPE … AS ENUM: membership enforced, dependency blocks DROP TYPE") {
    drop("graft_ct_en")
    psql.sql("drop type if exists graft_mood")
    psql.sql("create type graft_mood as enum ('sad', 'ok', 'happy')")
    val dup = intercept[IllegalArgumentException] {
      psql.sql("create type graft_mood as enum ('x')")
    }
    assert(dup.getMessage.contains("already exists"))
    psql.sql("create table graft_ct_en (name varchar, m graft_mood)")
    psql.sql("insert into graft_ct_en values ('a', 'happy'), ('b', 'sad')")
    // probed DuckDB: an out-of-domain value errors (its message is a
    // conversion error; ours is the membership CHECK — both constraint-class)
    val bad = intercept[Exception] {
      psql.sql("insert into graft_ct_en values ('c', 'angry')").collect()
    }
    assert(bad.getMessage.contains("CHECK constraint failed"), bad.getMessage)
    assert(spark.table("graft_ct_en").count() == 2L)
    // NULL passes (the column is nullable)
    psql.sql("insert into graft_ct_en values ('d', null)")
    // the enum column lowered to string; the marker records the type
    val c = TableConstraints.load(spark, "graft_ct_en")
    assert(c.enumCols == Map("m" -> "graft_mood"))
    assert(spark.table("graft_ct_en").schema("m").dataType.sql.toLowerCase == "string")
    // DROP TYPE refuses while the table depends on it (DuckDB's rule)
    val dep = intercept[IllegalArgumentException] { psql.sql("drop type graft_mood") }
    assert(dep.getMessage.contains("depend"), dep.getMessage)
    psql.sql("drop table graft_ct_en")
    psql.sql("drop type graft_mood")
    val gone = intercept[IllegalArgumentException] { psql.sql("drop type graft_mood") }
    assert(gone.getMessage.contains("does not exist"))
    psql.sql("drop type if exists graft_mood") // no error
  }

  test("ALTER TABLE over constrained columns: key drops refuse, renames migrate metadata") {
    drop("graft_ct_alt")
    psql.sql("create table graft_ct_alt (i int primary key, " +
      "v varchar default 'x', n int not null, check (n >= 0), q int)")
    psql.sql("insert into graft_ct_alt values (1, 'a', 5, 9)")
    // probed DuckDB wording: key-column drops refuse
    val dk = intercept[IllegalArgumentException] {
      psql.sql("alter table graft_ct_alt drop column i")
    }
    assert(dk.getMessage.contains("UNIQUE constraint that depends on it"))
    val dc = intercept[IllegalArgumentException] {
      psql.sql("alter table graft_ct_alt drop column n")
    }
    assert(dc.getMessage.contains("CHECK constraint"))
    // a plain column drops fine; a default-bearing one cleans its marker
    psql.sql("alter table graft_ct_alt drop column q")
    psql.sql("alter table graft_ct_alt drop column v")
    assert(TableConstraints.load(spark, "graft_ct_alt").defaults.isEmpty)
    // renames migrate every piece of metadata (probed DuckDB renames through)
    psql.sql("alter table graft_ct_alt rename column i to j")
    psql.sql("alter table graft_ct_alt rename column n to m")
    val c = TableConstraints.load(spark, "graft_ct_alt")
    assert(c.primaryKey == Seq("j"))
    assert(c.notNull.map(_.toLowerCase).toSet == Set("j", "m"))
    assert(c.checks == Seq("m >= 0"))
    // …and the migrated constraints still ENFORCE
    val pk = intercept[IllegalArgumentException] {
      psql.sql("insert into graft_ct_alt values (1, 3)")
    }
    assert(pk.getMessage.contains("violates primary key"))
    val ck = intercept[Exception] {
      psql.sql("insert into graft_ct_alt values (2, -4)").collect()
    }
    assert(ck.getMessage.contains("CHECK constraint failed"))
    assert(psql.sql("insert into graft_ct_alt values (2, 4)").collect()(0).getLong(0) == 1L)
  }

  test("enum types are scoped per SparkSession (like macros/variables/sequences)") {
    psql.sql("drop type if exists graft_scope_mood")
    psql.sql("create type graft_scope_mood as enum ('a', 'b')")
    val other = spark.newSession()
    // the sibling session does not know the type: a table using it treats
    // the name as an (unknown) plain type and fails in Spark's parser
    val e = intercept[Exception] {
      Psql(other).sql("create table graft_scope_t (m graft_scope_mood not null)")
    }
    assert(!e.getMessage.contains("CHECK"), e.getMessage)
    // …and can declare its own same-named type independently
    Psql(other).sql("create type graft_scope_mood as enum ('x')")
    psql.sql("drop type graft_scope_mood")
  }

  test("typed defaults and expressions: date, arithmetic, parenthesized") {
    drop("graft_ct_k")
    psql.sql("create table graft_ct_k (i int primary key, " +
      "d date default date '2024-01-01', m int default (2 + 3) not null)")
    psql.sql("insert into graft_ct_k (i) values (1)")
    val r = spark.table("graft_ct_k").collect()(0)
    assert(r.getDate(1).toString == "2024-01-01")
    assert(r.getInt(2) == 5)
    val c = TableConstraints.load(spark, "graft_ct_k")
    assert(c.notNull.toSet == Set("m", "i"))
  }

  test("FOREIGN KEY enforcement is opt-in: SET graft_enforce_foreign_keys") {
    drop("graft_ct_fkp"); drop("graft_ct_fkc")
    psql.sql("create table graft_ct_fkp (k int primary key, s varchar)")
    psql.sql("insert into graft_ct_fkp values (1, 'a'), (2, 'b')")
    psql.sql("create table graft_ct_fkc (id int primary key, k int references graft_ct_fkp (k))")
    // OFF (default): recorded, not enforced — the orphan insert passes
    psql.sql("insert into graft_ct_fkc values (10, 99)")
    psql.sql("delete from graft_ct_fkc where id = 10")
    psql.sql("set graft_enforce_foreign_keys = true")
    try {
      // valid and NULL FK values pass (probed DuckDB: MATCH SIMPLE)
      psql.sql("insert into graft_ct_fkc values (11, 1), (12, null)")
      // an orphan fails with DuckDB's wording and writes nothing
      val e = intercept[IllegalArgumentException] {
        psql.sql("insert into graft_ct_fkc values (13, 99)")
      }
      assert(e.getMessage.contains("Violates foreign key constraint"), e.getMessage)
      assert(e.getMessage.contains("k: 99"), e.getMessage)
      assert(spark.table("graft_ct_fkc").count() == 2)
      // the ON CONFLICT path enforces too
      val e2 = intercept[IllegalArgumentException] {
        psql.sql("insert into graft_ct_fkc values (11, 77) " +
          "on conflict (id) do update set k = excluded.k")
      }
      assert(e2.getMessage.contains("foreign key"), e2.getMessage)
      // table-form FK with explicit columns parses and enforces
      drop("graft_ct_fkc2")
      psql.sql("create table graft_ct_fkc2 (id int primary key, pk int, " +
        "foreign key (pk) references graft_ct_fkp (k))")
      val e3 = intercept[IllegalArgumentException] {
        psql.sql("insert into graft_ct_fkc2 values (1, 42)")
      }
      // probed DuckDB 1.0: the orphan-key violation names the REFERENCED
      // table's column (k), not the child's (pk)
      assert(e3.getMessage.contains("k: 42"), e3.getMessage)
    } finally psql.sql("reset graft_enforce_foreign_keys")
    // OFF again after RESET
    psql.sql("insert into graft_ct_fkc values (14, 88)")
    assert(spark.table("graft_ct_fkc").count() == 3)
  }

  test("FK enforcement, parent side: DELETE/UPDATE of a referenced key throws") {
    drop("graft_ct_fpp"); drop("graft_ct_fpc")
    psql.sql("create table graft_ct_fpp (k int primary key, s varchar)")
    psql.sql("insert into graft_ct_fpp values (1, 'a'), (2, 'b'), (3, 'c')")
    psql.sql("create table graft_ct_fpc (id int, pk int references graft_ct_fpp (k))")
    psql.sql("insert into graft_ct_fpc values (10, 1), (11, 2)")
    psql.sql("set graft_enforce_foreign_keys = true")
    try {
      // deleting a referenced parent row throws DuckDB's wording, with the
      // CHILD's column name (probed 1.0), and writes nothing
      val e = intercept[IllegalArgumentException] {
        psql.sql("delete from graft_ct_fpp where k = 1")
      }
      assert(e.getMessage.contains(
        """key "pk: 1" is still referenced by a foreign key in a different table"""),
        e.getMessage)
      assert(spark.table("graft_ct_fpp").count() == 3)
      // an unreferenced parent row deletes fine
      psql.sql("delete from graft_ct_fpp where k = 3")
      assert(spark.table("graft_ct_fpp").count() == 2)
      // reassigning a referenced key violates EVEN when the value is
      // unchanged (probed: DuckDB rejects `SET k = k` on a referenced row)
      val e2 = intercept[IllegalArgumentException] {
        psql.sql("update graft_ct_fpp set k = k where k = 1")
      }
      assert(e2.getMessage.contains("is still referenced"), e2.getMessage)
      // non-key parent columns update freely (probed DuckDB)
      psql.sql("update graft_ct_fpp set s = 'z' where k = 1")
      assert(spark.table("graft_ct_fpp").where("k = 1 and s = 'z'").count() == 1)
      // deleting the child first unblocks the parent
      psql.sql("delete from graft_ct_fpc where pk = 1")
      psql.sql("delete from graft_ct_fpp where k = 1")
      assert(spark.table("graft_ct_fpp").count() == 1)
    } finally psql.sql("reset graft_enforce_foreign_keys")
  }

  test("FK enforcement, child UPDATE: assigned FK columns re-resolve") {
    drop("graft_ct_fup"); drop("graft_ct_fuc")
    psql.sql("create table graft_ct_fup (k int primary key)")
    psql.sql("insert into graft_ct_fup values (1), (2)")
    psql.sql("create table graft_ct_fuc (id int, k int references graft_ct_fup (k), v int)")
    psql.sql("insert into graft_ct_fuc values (10, 1, 0), (11, 2, 0)")
    psql.sql("set graft_enforce_foreign_keys = true")
    try {
      val e = intercept[IllegalArgumentException] {
        psql.sql("update graft_ct_fuc set k = -5 where id = 10")
      }
      assert(e.getMessage.contains(
        """key "k: -5" does not exist in the referenced table"""), e.getMessage)
      assert(spark.table("graft_ct_fuc").where("k = -5").count() == 0)
      // valid reassignment and NULLing pass (probed DuckDB)
      psql.sql("update graft_ct_fuc set k = 2 where id = 10")
      psql.sql("update graft_ct_fuc set k = null where id = 11")
      // non-FK columns update without touching the parent
      psql.sql("update graft_ct_fuc set v = 9")
      assert(spark.table("graft_ct_fuc").where("v = 9").count() == 2)
    } finally psql.sql("reset graft_enforce_foreign_keys")
  }

  test("FK enforcement covers the MERGE family (insert + update + delete)") {
    drop("graft_ct_fmp"); drop("graft_ct_fmc")
    psql.sql("create table graft_ct_fmp (k int primary key)")
    psql.sql("insert into graft_ct_fmp values (1), (2)")
    psql.sql("create table graft_ct_fmc (id int primary key, k int references graft_ct_fmp (k))")
    psql.sql("insert into graft_ct_fmc values (10, 1), (11, 2)")
    psql.sql("set graft_enforce_foreign_keys = true")
    try {
      // MERGE insert clause: orphan FK value in the inserted batch throws
      val e = intercept[IllegalArgumentException] {
        psql.sql("""merge into graft_ct_fmc using (select 12 as id, 77 as k) s
          |on graft_ct_fmc.id = s.id
          |when not matched then insert values (s.id, s.k)""".stripMargin)
      }
      assert(e.getMessage.contains("Violates foreign key constraint"), e.getMessage)
      assert(spark.table("graft_ct_fmc").count() == 2)
      // MERGE update clause assigning the FK column to an orphan throws
      val e2 = intercept[IllegalArgumentException] {
        psql.sql("""merge into graft_ct_fmc using (select 10 as id, -3 as k) s
          |on graft_ct_fmc.id = s.id
          |when matched then update set k = s.k""".stripMargin)
      }
      assert(e2.getMessage.contains("does not exist in the referenced table"),
        e2.getMessage)
      // parent-side through MERGE: deleting a still-referenced parent throws
      val e3 = intercept[IllegalArgumentException] {
        psql.sql("""merge into graft_ct_fmp using (select 1 as k) s
          |on graft_ct_fmp.k = s.k
          |when matched then delete""".stripMargin)
      }
      assert(e3.getMessage.contains("is still referenced"), e3.getMessage)
      assert(spark.table("graft_ct_fmp").count() == 2)
      // valid MERGE passes: insert a row referencing an existing parent
      psql.sql("""merge into graft_ct_fmc using (select 13 as id, 2 as k) s
        |on graft_ct_fmc.id = s.id
        |when not matched then insert values (s.id, s.k)""".stripMargin)
      assert(spark.table("graft_ct_fmc").count() == 3)
      // UPDATE … FROM (the join-update rides the MERGE pipeline) enforces
      val e4 = intercept[IllegalArgumentException] {
        psql.sql("""update graft_ct_fmc set k = src.nk
          |from (select 10 as id, -9 as nk) as src
          |where graft_ct_fmc.id = src.id""".stripMargin)
      }
      assert(e4.getMessage.contains("does not exist in the referenced table"),
        e4.getMessage)
    } finally psql.sql("reset graft_enforce_foreign_keys")
  }

  test("FK enforcement, self-referential: same-batch parents rejected like DuckDB") {
    drop("graft_ct_femp")
    psql.sql("create table graft_ct_femp (id int primary key, mgr int references graft_ct_femp (id))")
    psql.sql("set graft_enforce_foreign_keys = true")
    try {
      // probed DuckDB 1.0: a batch referencing its OWN rows is rejected —
      // the FK probe sees the pre-statement parent state
      val e = intercept[IllegalArgumentException] {
        psql.sql("insert into graft_ct_femp values (1, null), (2, 1)")
      }
      assert(e.getMessage.contains("does not exist in the referenced table"),
        e.getMessage)
      // row-at-a-time works
      psql.sql("insert into graft_ct_femp values (1, null)")
      psql.sql("insert into graft_ct_femp values (2, 1)")
      psql.sql("insert into graft_ct_femp values (3, 2)")
      // probed DuckDB: DELETE of the whole self-referencing family is
      // rejected — the child probe sees the PRE-delete state
      val e2 = intercept[IllegalArgumentException] { psql.sql("delete from graft_ct_femp") }
      assert(e2.getMessage.contains("is still referenced"), e2.getMessage)
      // leaf-first deletion works
      psql.sql("delete from graft_ct_femp where id = 3")
      psql.sql("delete from graft_ct_femp where id = 2")
      psql.sql("delete from graft_ct_femp where id = 1")
      assert(spark.table("graft_ct_femp").count() == 0)
    } finally psql.sql("reset graft_enforce_foreign_keys")
  }

  test("ORDER BY an enum column sorts by DECLARATION order (probed DuckDB)") {
    drop("graft_ct_eord")
    psql.sql("drop type if exists graft_eord_mood")
    // deliberately non-alphabetical declaration: lexical would differ
    psql.sql("create type graft_eord_mood as enum ('sad', 'ok', 'happy')")
    psql.sql("create table graft_ct_eord (i int primary key, m graft_eord_mood)")
    psql.sql("insert into graft_ct_eord values (1, 'happy'), (2, 'sad'), (3, 'ok'), (4, null)")
    val asc = psql.sql("from graft_ct_eord |> where m is not null |> order by m |> select i")
      .collect().map(_.getInt(0)).toSeq
    assert(asc == Seq(2, 3, 1), asc) // sad < ok < happy (declaration order)
    val desc = psql.sql("from graft_ct_eord |> where m is not null " +
      "|> order by m desc, i |> select i").collect().map(_.getInt(0)).toSeq
    assert(desc == Seq(1, 3, 2), desc)
    // window ORDER BY rewrites too
    val rk = psql.sql("from graft_ct_eord |> where m is not null |> select i, " +
      "row_number() over (order by m, i) as rk |> order by i")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rk == Seq((1, 3), (2, 1), (3, 2)), rk)
    // a NON-enum column in the same list is untouched; expressions pass through
    val both = psql.sql("from graft_ct_eord |> where m is not null " +
      "|> order by i desc, m |> select i").collect().map(_.getInt(0)).toSeq
    assert(both == Seq(3, 2, 1), both)
    // a re-created table WITHOUT the enum column stops rewriting (stale
    // registry entries are catalog-checked)
    drop("graft_ct_eord")
    psql.sql("create table graft_ct_eord (i int primary key, m varchar)")
    psql.sql("insert into graft_ct_eord values (1, 'b'), (2, 'a')")
    val lex = psql.sql("from graft_ct_eord |> order by m |> select i")
      .collect().map(_.getInt(0)).toSeq
    assert(lex == Seq(2, 1), lex) // plain lexical again
    psql.sql("drop type graft_eord_mood")
  }

  test("enum ORDER BY scoping: output aliases, qualifiers, FROM/JOIN position (probed DuckDB)") {
    drop("graft_ct_esc"); drop("graft_ct_esco")
    psql.sql("drop type if exists graft_esc_mood")
    psql.sql("create type graft_esc_mood as enum ('sad', 'ok', 'happy')")
    psql.sql("create table graft_ct_esc (i int primary key, e graft_esc_mood)")
    psql.sql("insert into graft_ct_esc values (1, 'happy'), (2, 'sad'), (3, 'ok')")
    // same-named VARCHAR column on a different relation
    psql.sql("create table graft_ct_esco (i int primary key, e varchar)")
    psql.sql("insert into graft_ct_esco values (1, 'happy'), (2, 'sad'), (3, 'ok')")
    def ids(q: String): Seq[Int] =
      psql.sql(q).select("i").collect().map(_.getInt(0)).toSeq
    // 1. explicit output alias shadows the enum column → LEXICAL (probed)
    assert(ids("select i, cast(e as string) as e from graft_ct_esc order by e")
      == Seq(1, 3, 2))
    // 2. implicit alias form shadows too (probed)
    assert(ids("select i, cast(e as string) e from graft_ct_esc order by e")
      == Seq(1, 3, 2))
    // 3. alias of a BARE enum reference keeps declaration order (probed)
    assert(ids("select i, e as raw from graft_ct_esc order by raw, i")
      == Seq(2, 3, 1))
    // 4. self-alias keeps declaration order (probed)
    assert(ids("select i, e as e from graft_ct_esc order by e") == Seq(2, 3, 1))
    // 5. qualified item against a NON-enum relation stays lexical even
    //    when an enum table is mentioned in the statement (advisor case)
    assert(ids("""select o.i, o.e from graft_ct_esco o
      |where o.i in (select i from graft_ct_esc) order by o.e""".stripMargin)
      == Seq(1, 3, 2))
    // 6. qualified item through the enum table's ALIAS rewrites (probed)
    assert(ids("""select t.i, t.e from graft_ct_esc as t
      |join graft_ct_esco o on t.i = o.i order by t.e""".stripMargin)
      == Seq(2, 3, 1))
    // 7. a word collision OUTSIDE relation position does not drag the
    //    enum table into scope: string literal mention, lexical sort
    assert(ids("""select i, e from graft_ct_esco
      |where 'graft_ct_esc' <> '' order by e""".stripMargin) == Seq(1, 3, 2))
    // 8. pipe-stage alias shadowing: the cast stage's alias wins (lexical)
    assert(ids("""from graft_ct_esc
      ||> select i, cast(e as varchar) as e
      ||> order by e""".stripMargin) == Seq(1, 3, 2))
    // 9. pipe ORDER BY before any projection keeps declaration order
    assert(ids("from graft_ct_esc |> order by e |> select i") == Seq(2, 3, 1))
    // 10. a SUBQUERY that casts the enum away shadows the outer ORDER BY
    //     (probed DuckDB: lexical), explicit and implicit alias forms
    assert(ids("select i from (select i, cast(e as string) as e from graft_ct_esc) order by e")
      == Seq(1, 3, 2))
    assert(ids("select i from (select i, cast(e as string) e from graft_ct_esc) order by e")
      == Seq(1, 3, 2))
    // 11. a bare passthrough subquery keeps declaration order (probed)
    assert(ids("select i from (select i, e from graft_ct_esc) order by e")
      == Seq(2, 3, 1))
    // 12. two-level nesting: the shadow resolves through a `select *`
    //     middle layer (probed DuckDB: lexical)
    assert(ids("""select i from (select * from
      |(select i, cast(e as string) as e from graft_ct_esc)) order by e""".stripMargin)
      == Seq(1, 3, 2))
    // 13. subquery-ALIAS-qualified items resolve through the subquery's
    //     select list (probed: plain → declaration, cast → lexical,
    //     star-passthrough → declaration)
    assert(ids("select i from (select i, e from graft_ct_esc) s order by s.e")
      == Seq(2, 3, 1))
    assert(ids("select i from (select i, cast(e as string) as e from graft_ct_esc) s order by s.e")
      == Seq(1, 3, 2))
    assert(ids("select i from (select * from graft_ct_esc) s order by s.e")
      == Seq(2, 3, 1))
    // 14. renamed bare ref through a subquery keeps declaration order
    assert(ids("select i from (select i, e as raw from graft_ct_esc) s order by s.raw")
      == Seq(2, 3, 1))
    psql.sql("drop table graft_ct_esc")
    psql.sql("drop table graft_ct_esco")
    psql.sql("drop type graft_esc_mood")
  }

  test("RENAME COLUMN follows a column referenced only by a PLAIN index") {
    drop("graft_ct_pidx")
    psql.sql("create table graft_ct_pidx (i int primary key, tag varchar)")
    psql.sql("create index graft_pidx_tag on graft_ct_pidx (tag)")
    // `tag` appears in NO constraint list — only in the plain index; the
    // rename must still migrate the index's recorded column list
    psql.sql("alter table graft_ct_pidx rename column tag to label")
    val props = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_ct_pidx"))
      .properties
    val idx = props("graft.constraints.index.graft_pidx_tag")
    assert(idx == "plain|label", idx)
    // ...and a rename touching a unique INDEX does not double-record it as
    // a unique.N constraint property
    psql.sql("create unique index graft_pidx_u on graft_ct_pidx (label)")
    psql.sql("alter table graft_ct_pidx rename column label to name2")
    val props2 = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_ct_pidx"))
      .properties
    assert(props2("graft.constraints.index.graft_pidx_u") == "unique|name2")
    assert(!props2.keys.exists(_.startsWith("graft.constraints.unique.")),
      props2.keys.filter(_.startsWith("graft.constraints.")).mkString(", "))
    psql.sql("drop index graft_pidx_tag")
    psql.sql("drop index graft_pidx_u")
  }

  test("UPDATE touching key columns re-checks uniqueness (probed DuckDB)") {
    drop("graft_ct_upk")
    psql.sql("create table graft_ct_upk (i int primary key, v varchar, u int unique)")
    psql.sql("insert into graft_ct_upk values (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    // collapsing the PK raises and leaves the table untouched
    val pk = intercept[IllegalArgumentException] {
      psql.sql("update graft_ct_upk set i = 1 where i in (1, 2)")
    }
    assert(pk.getMessage.contains("violates primary key"), pk.getMessage)
    assert(spark.table("graft_ct_upk").count() == 3)
    assert(psql.sql("from graft_ct_upk |> where i = 2 |> select v")
      .collect()(0).getString(0) == "b")
    // collapsing a UNIQUE column raises too
    val uq = intercept[IllegalArgumentException] {
      psql.sql("update graft_ct_upk set u = 10 where i = 2")
    }
    assert(uq.getMessage.contains("violates unique"), uq.getMessage)
    // a key-moving UPDATE that keeps keys distinct passes (count 1)
    val ok = psql.sql("update graft_ct_upk set i = 9 where i = 3")
    assert(ok.collect()(0).getLong(0) == 1L)
    assert(spark.table("graft_ct_upk").where("i = 9").count() == 1)
    // a SET not touching keys skips the re-check and still updates
    assert(psql.sql("update graft_ct_upk set v = 'z' where i = 9")
      .collect()(0).getLong(0) == 1L)
  }

  test("UPDATE key re-check sees collisions across partitions (pruned path disabled)") {
    drop("graft_ct_upkp")
    spark.sql("drop table if exists graft_ct_upkp")
    // partitioned target: the collapsed key's victim lives in ANOTHER
    // partition, so a per-partition check would miss it
    psql.sql("create table graft_ct_upkp (i int primary key, p int) " +
      "using parquet partitioned by (p)")
    psql.sql("insert into graft_ct_upkp values (1, 100), (2, 200)")
    val e = intercept[IllegalArgumentException] {
      psql.sql("update graft_ct_upkp set i = 1 where p = 200")
    }
    assert(e.getMessage.contains("violates primary key"), e.getMessage)
    assert(spark.table("graft_ct_upkp").where("i = 2").count() == 1)
  }
}
