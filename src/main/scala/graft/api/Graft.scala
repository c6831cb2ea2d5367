package graft.api

/** Facade twin of the reference's `Rehiver` class (src/index.ts:1985):
  * the same factory surface (`Rehiver.partition.create`,
  * `Rehiver.time.daily(...)`, `Rehiver.changes.detect(...)`) so a
  * reference user's entry points translate one-to-one. The S3
  * client/bucket-admin plumbing the reference carries (createBucket,
  * retries, credentials) belongs to the storage layer, not a compute
  * library — listing/matching lives in [[graft.sources.FileManifest]].
  */
object Graft {

  object partition {
    def create(fields: PartitionField*): HivePartitionParser =
      new HivePartitionParser(fields)
  }

  object time {
    def daily(f: TimePartitionConfig => TimePartitionConfig = identity): TimePartitionGenerator =
      new TimePartitionGenerator(f(TimePartitionConfig(TimeGranularity.Daily)))
    def hourly(f: TimePartitionConfig => TimePartitionConfig = identity): TimePartitionGenerator =
      new TimePartitionGenerator(f(TimePartitionConfig(TimeGranularity.Hourly)))
    def monthly(f: TimePartitionConfig => TimePartitionConfig = identity): TimePartitionGenerator =
      new TimePartitionGenerator(f(TimePartitionConfig(TimeGranularity.Monthly)))
    def yearly(f: TimePartitionConfig => TimePartitionConfig = identity): TimePartitionGenerator =
      new TimePartitionGenerator(f(TimePartitionConfig(TimeGranularity.Yearly)))
    def custom(config: TimePartitionConfig): TimePartitionGenerator =
      new TimePartitionGenerator(config)
  }

  object changes {
    def detect(options: ChangeDetectionOptions = ChangeDetectionOptions()): ChangeDetector =
      new ChangeDetector(options)
  }

  def matcher(nocase: Boolean = false): PathMatcher = new PathMatcher(nocase)
}
